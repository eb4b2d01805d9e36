package graft.functions

import graft.SparkSpec

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii replaces emails, IPs and number runs with typed tokens") {
    val df = Seq(
      "contact john.doe+x@example.co.uk now",
      "server at 192.168.10.1 responded",
      "call 555-123-4567 or (02) 9999 1234",
      "clean text with the number 7 only").toDF("t")
    val got = df.select(TextFunctions.scrubPii($"t")).as[String].collect()
    assert(got(0) == "contact <EMAIL> now")
    assert(got(1) == "server at <IP> responded")
    assert(got(2) == "call <NUMBER> or (<NUMBER>")  // leading '(' not in the run class start
    assert(got(3) == "clean text with the number 7 only")
  }

  test("piiCounts audits per kind") {
    val df = Seq("a@b.io and c@d.org from 10.0.0.1 ref 12345-67890").toDF("t")
    val row = df.select(TextFunctions.piiCounts($"t").as("p")).select("p.*").collect()(0)
    // counts are independent per kind: the IP also matches the number-run
    // regex (scrubPii's replacement ORDER resolves that; audit counts don't)
    assert(row.getInt(0) == 2 && row.getInt(1) == 1 && row.getInt(2) == 2)
  }
}
