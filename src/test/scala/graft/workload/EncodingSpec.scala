package graft.workload

import java.nio.file.Files
import java.nio.charset.Charset
import graft.SparkSpec

/** S2: encoding detection + non-UTF-8 audit scan. */
class EncodingSpec extends SparkSpec {

  private val line =
    "2024-01-02 03:04:05,123 [query] |Client=10.0.0.1:9030|User=root|Db=商店|State=EOF|Time(ms)=12|QueryId=q1|IsQuery=true|Stmt=SELECT 1"

  test("detectEncoding: UTF-8 accepted, GBK bytes promoted to GB18030") {
    assert(AuditLog.detectEncoding(line.getBytes("UTF-8")) == "UTF-8")
    assert(AuditLog.detectEncoding(line.getBytes("GBK")) == "GB18030")
    // a UTF-8 sample cut mid-multibyte must not misdetect
    val cut = line.getBytes("UTF-8").dropRight(line.getBytes("UTF-8").length - 45)
    assert(AuditLog.detectEncoding("商店商店".getBytes("UTF-8").dropRight(1)) == "UTF-8")
  }

  test("GBK audit file decodes through the detected charset") {
    val dir = Files.createTempDirectory("enc").toString
    val f = s"$dir/fe.audit.log"
    Files.write(java.nio.file.Paths.get(f), (line + "\n").getBytes("GBK"))
    val enc = AuditLog.detectFileEncoding(f)
    assert(enc == "GB18030")
    val record = AuditLog.records(spark, f, enc).collect().head.getString(2)
    assert(record.contains("Db=商店"), s"decoded record: $record")
    // the default UTF-8 path would NOT see the db name intact
    val rawRecord = AuditLog.records(spark, f).collect().head.getString(2)
    assert(!rawRecord.contains("Db=商店"))
  }
}
