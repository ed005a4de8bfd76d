package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7 — remote audit-log discovery + fetch (reference: `src/ssh.go:1-116`,
  * `cmd/dump.go:538-586`, `src/db.go:273-301`).
  *
  * The reference dumps a live Doris FE's audit log in three steps:
  * `show frontends DISKS` → the row whose DirType is `audit-log` gives
  * the log directory; `ssh ls` lists `fe.audit.log*` files there; `scp`
  * copies the chosen one locally. This is an OPS concern, not dataflow
  * — the bytes only become engine input once they land and the file
  * scan (`workload.AuditLog`) takes over — so the engine keeps it
  * driver-side and pluggable:
  *
  *   - the DISKS-row projection is ordinary DataFrame code over whatever
  *     source produced the `show frontends DISKS` result (the JDBC audit
  *     source reads live FEs; tests use literal frames);
  *   - the ssh/scp transport sits behind [[RemoteFetch.CommandRunner]] —
  *     the default shells out to the system `ssh`/`scp` binaries exactly
  *     like an operator would, and tests substitute a fake, so NO test
  *     ever opens a network connection.
  *
  * Scale note: the fetch is one file per FE (audit logs rotate at fixed
  * size); the distributed work starts at the scan, which splits the
  * landed file by line (see AuditLog). Nothing here touches executors.
  */
object RemoteFetch {

  /** Transport seam. `run` returns (exitCode, stdout). */
  trait CommandRunner {
    def run(cmd: Seq[String]): (Int, String)
  }

  /** Default transport: the system ssh/scp binaries (BatchMode so a
    * missing key fails fast instead of prompting). */
  object ProcessRunner extends CommandRunner {
    def run(cmd: Seq[String]): (Int, String) = {
      val out = new StringBuilder
      val code = scala.sys.process.Process(cmd) !
        scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), _ => ())
      (code, out.toString)
    }
  }

  /** `user@host[:port]` + path, parsed from the reference's SSH-URL form
    * `ssh://user@host:port/path` (port defaults to 22). */
  final case class SshTarget(user: String, host: String, port: Int, path: String) {
    def userAtHost: String = s"$user@$host"
  }

  def parseSshUrl(url: String): SshTarget = {
    val u = new java.net.URI(
      if (url.startsWith("ssh://")) url else s"ssh://$url")
    require(u.getHost != null, s"bad ssh url: $url")
    val user = Option(u.getUserInfo).map(_.takeWhile(_ != ':'))
      .getOrElse(sys.props.getOrElse("user.name", "root"))
    SshTarget(user, u.getHost, if (u.getPort > 0) u.getPort else 22,
      Option(u.getPath).filter(_.nonEmpty).getOrElse("/"))
  }

  /** The `show frontends DISKS` → audit-log dir projection
    * (reference `db.go:273-301`): the Dir of the first row whose
    * DirType matches. Pure DataFrame code — works identically over the
    * live JDBC source or a test literal. */
  def disksDir(frontendsDisks: DataFrame, diskType: String = "audit-log"): Option[String] =
    frontendsDisks.filter(col("DirType") === diskType)
      .select(col("Dir").cast("string")).limit(1)
      .collect().headOption.map(_.getString(0))

  /** List remote audit-log files matching `fe.audit.log*` under `dir`
    * (reference `ssh.go:38-64` runs `ls -l <path> | awk '{print $NF}'`;
    * ls -1 emits the same name-per-line without the awk). */
  def listAuditLogs(runner: CommandRunner, privKey: String,
                    sshAddress: String, dir: String): Seq[String] = {
    val t = parseSshUrl(sshAddress)
    // The dir comes from a remote SHOW FRONTENDS DISKS row — shell-quote
    // it (single quotes, ' → '\'' ) so spaces/metacharacters can't break
    // the listing or execute remotely; the * stays OUTSIDE the quotes so
    // the remote shell still globs it.
    val base = if (dir.endsWith("/")) dir else dir + "/"
    val quoted = "'" + base.replace("'", "'\\''") + "'"
    val (code, out) = runner.run(Seq("ssh", "-o", "BatchMode=yes",
      "-i", privKey, "-p", t.port.toString, t.userAtHost,
      s"ls -1 ${quoted}fe.audit.log*"))
    require(code == 0, s"SSH list remote audit log failed (exit $code)")
    out.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Copy one remote file locally (reference `ssh.go:66-116`). */
  def fetch(runner: CommandRunner, privKey: String, sshAddress: String,
            remotePath: String, localPath: String): Unit = {
    val t = parseSshUrl(sshAddress)
    val (code, _) = runner.run(Seq("scp", "-o", "BatchMode=yes",
      "-i", privKey, "-P", t.port.toString,
      s"${t.userAtHost}:$remotePath", localPath))
    require(code == 0,
      s"scp failed (exit $code), check the ssh key or address")
  }

  /** The full reference flow (`cmd/dump.go:538-586`): DISKS row → dir →
    * remote ls → `choose` (defaults to newest = lexicographically last,
    * since rotated logs suffix timestamps) → fetch. Returns the local
    * path. */
  def fetchAuditLog(frontendsDisks: DataFrame, runner: CommandRunner,
                    privKey: String, sshAddress: String, localPath: String,
                    choose: Seq[String] => String = _.max): String = {
    val dir = disksDir(frontendsDisks).getOrElse(
      sys.error("no audit-log DirType row in show frontends DISKS"))
    val logs = listAuditLogs(runner, privKey, sshAddress, dir)
    require(logs.nonEmpty, "no audit log found on remote server")
    fetch(runner, privKey, sshAddress, choose(logs), localPath)
    localPath
  }
}
