package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction: pattern behavior on hand-built strings, audit
  * consistency on the real gate path. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Pii.redact(col("t"))).head.getString(0)

  test("emails, phones and IPs are replaced with typed placeholders") {
    assert(redactOne("mail bob.smith+x@sub.example.co.uk end") ==
           "mail <EMAIL> end")
    assert(redactOne("call 555-123-4567 now") == "call <PHONE> now")
    assert(redactOne("from 192.168.0.1 port") == "from <IP> port")
    assert(redactOne("a@b.com 10.0.0.1 555-000-1111") ==
           "<EMAIL> <IP> <PHONE>")
  }

  test("word boundaries: partial digit runs are not phone numbers") {
    // 7 digits glued to letters / longer runs must not match
    assert(redactOne("id 1555-123-45678 x") == "id 1555-123-45678 x")
    assert(redactOne("v1.2.3.4beta") == "v1.2.3.4beta")
  }

  test("redaction order prevents nested rematches") {
    // an email whose domain looks like an IP is consumed as one email
    assert(redactOne("u@10.0.0.com done") == "<EMAIL> done")
  }

  test("audit counts follow the deterministic injection schedule") {
    val rows = Pii.piiAudit(spark, sfDir)
      .select("doc_id", "n_emails", "n_phones", "n_ips")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, e, p, ip) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(e == (if (id % 7 == 0) 2 else 1), s"doc $id emails=$e")
      assert(p == (if (id % 3 == 0) 1 else 0), s"doc $id phones=$p")
      assert(ip == (if (id % 5 == 0) 1 else 0), s"doc $id ips=$ip")
    }
  }

  test("pii audit is a pure map — no shuffle in the plan") {
    val plan = Pii.piiAudit(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
