package graft.sources

import graft.SparkSpec

/** S7 closure: the reference's remote audit-log discovery + fetch flow
  * (`show frontends DISKS` → ssh ls → choose → scp), driven end-to-end
  * against a FAKE transport — no network, ever. */
class RemoteFetchSpec extends SparkSpec {
  import spark.implicits._

  /** Records every command; replies from a canned script. */
  private class FakeRunner(lsOut: String, lsCode: Int = 0, scpCode: Int = 0)
      extends RemoteFetch.CommandRunner {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    def run(cmd: Seq[String]): (Int, String) = {
      calls += cmd
      cmd.head match {
        case "ssh" => (lsCode, lsOut)
        case "scp" => (scpCode, "")
        case other => sys.error(s"unexpected command $other")
      }
    }
  }

  private def disks = Seq(
    ("meta", "/doris/fe/meta"),
    ("audit-log", "/doris/fe/log"),
    ("log", "/doris/fe/log")).toDF("DirType", "Dir")

  test("ssh url parsing: user/host/port/path, defaults applied") {
    val t = RemoteFetch.parseSshUrl("ssh://root@fe1.example.com:2222/var/log")
    assert(t == RemoteFetch.SshTarget("root", "fe1.example.com", 2222, "/var/log"))
    val d = RemoteFetch.parseSshUrl("admin@fe2")
    assert(d.host == "fe2" && d.port == 22 && d.user == "admin")
    // password-in-url form keeps only the user for the command line
    assert(RemoteFetch.parseSshUrl("ssh://u:secret@h/p").user == "u")
  }

  test("disksDir projects the audit-log row from show frontends DISKS") {
    assert(RemoteFetch.disksDir(disks).contains("/doris/fe/log"))
    assert(RemoteFetch.disksDir(disks, "meta").contains("/doris/fe/meta"))
    assert(RemoteFetch.disksDir(disks, "nope").isEmpty)
  }

  test("full flow: discovery -> ls -> choose newest -> scp, no network") {
    val runner = new FakeRunner(
      "/doris/fe/log/fe.audit.log\n/doris/fe/log/fe.audit.log.20260810-1\n")
    val local = RemoteFetch.fetchAuditLog(disks, runner,
      privKey = "/k", sshAddress = "ssh://root@fe1:22", localPath = "/tmp/a.log")
    assert(local == "/tmp/a.log")
    assert(runner.calls.length == 2)
    val ls = runner.calls(0)
    assert(ls.head == "ssh" && ls.contains("root@fe1") &&
      ls.last == "ls -1 '/doris/fe/log/'fe.audit.log*")
    val scp = runner.calls(1)
    // default choose = lexicographically last = newest rotated file
    assert(scp.head == "scp" &&
      scp.contains("root@fe1:/doris/fe/log/fe.audit.log.20260810-1") &&
      scp.last == "/tmp/a.log")
  }

  test("listAuditLogs shell-quotes the DISKS-derived dir") {
    val runner = new FakeRunner("/a dir/fe.audit.log\n")
    RemoteFetch.listAuditLogs(runner, "/k", "root@fe1", "/a dir;echo x")
    // metacharacters ride inside single quotes; embedded quotes escape
    assert(runner.calls.head.last == "ls -1 '/a dir;echo x/'fe.audit.log*")
    val r2 = new FakeRunner("/x/fe.audit.log\n")
    RemoteFetch.listAuditLogs(r2, "/k", "root@fe1", "/it's/log")
    assert(r2.calls.head.last == "ls -1 '/it'\\''s/log/'fe.audit.log*")
  }

  test("failures are loud: bad exit codes and empty listings") {
    intercept[IllegalArgumentException] {
      RemoteFetch.listAuditLogs(new FakeRunner("", lsCode = 255),
        "/k", "root@fe1", "/doris/fe/log")
    }
    intercept[RuntimeException] {
      RemoteFetch.fetchAuditLog(disks.filter("DirType = 'meta'"),
        new FakeRunner(""), "/k", "root@fe1", "/tmp/a.log")
    }
    intercept[IllegalArgumentException] { // empty ls -> no log found
      RemoteFetch.fetchAuditLog(disks, new FakeRunner("\n"),
        "/k", "root@fe1", "/tmp/a.log")
    }
    intercept[IllegalArgumentException] { // scp failure propagates
      RemoteFetch.fetchAuditLog(disks,
        new FakeRunner("/doris/fe/log/fe.audit.log\n", scpCode = 1),
        "/k", "root@fe1", "/tmp/a.log")
    }
  }
}
