package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.query.Search

/** Ingestion/query-surface parity on the reference's 33-column member
  * schema (reference web/app.py semantics; FIXTURES.md §2/§4).
  */
class MembersParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val members = Members.members(spark, 2000).cache()

  test("generator is deterministic and parallelism-independent") {
    val a = Members.members(spark, 200).collect().map(_.toString).sorted.toSeq
    val b = Members.members(spark.newSession(), 200).repartition(7)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(members.columns.length == 33) // reference schema width
  }

  test("term search: case-insensitive conjunction over form fields (web/app.py:81-102)") {
    // case-flipped values must match — `term` with case_insensitive:true
    val got = Search.termSearch(members,
      Map("state" -> "ca", "memberStatus" -> "ACTIVE"), size = Int.MaxValue)
    val expected = members
      .filter(col("state") === "CA" && col("memberStatus") === "active")
    assert(got.count() == expected.count() && got.count() > 0)
    // empty criteria are ignored (reference skips blank form fields)
    val loose = Search.termSearch(members, Map("state" -> "CA", "city" -> ""), size = Int.MaxValue)
    assert(loose.count() == members.filter(col("state") === "CA").count())
    // size cap = 100 (web/app.py:88)
    assert(Search.termSearch(members, Map("country" -> "us")).count() == 100)
  }

  test("autocomplete: >=3 char guard, AND-of-prefixes, label shape (web/app.py:129-184)") {
    assert(Search.prefixSearch(members, "firstName", "jo").isEmpty) // guard
    assert(Search.prefixSearchAllFields(members, "jo").isEmpty)    // guard
    // fields:["*"] — every token prefix-matches ANY field, no caller concat
    val hits = Search.prefixSearchAllFields(members, "jam smi", size = Int.MaxValue).get
    val nameOnly = members.filter(
      lower(col("firstName")).startsWith("jam") && lower(col("lastName")).startsWith("smi"))
    // all-fields is a superset of the name-pair match (emails etc. also hit)
    assert(hits.count() >= nameOnly.count() && nameOnly.count() > 0)
    // exact cross-field semantics on a controlled frame: 'smi' matches doc 2
    // only via city, doc 3 fails the AND because no field prefixes 'jam'
    locally {
      import spark.implicits._
      val mini = Seq(
        (1L, "James", "Smith", "Boston"),
        (2L, "James", "Jones", "Smithfield"),
        (3L, "Mary", "Smith", "Springfield")).toDF("id", "first", "last", "city")
      val got = Search.prefixSearchAllFields(mini, "jam smi", size = Int.MaxValue)
        .get.select("id").as[Long].collect().toSet
      assert(got == Set(1L, 2L))
    }
    // suggestion label: "first last (memberId)" (web/app.py:177)
    val label = hits.select(
      concat(col("firstName"), lit(" "), col("lastName"),
        lit(" ("), col("memberId"), lit(")")).as("label")).head().getString(0)
    assert(label.matches("\\w+ \\w+ \\(mem-[0-9a-f]{8}-\\d{6}\\)"))
  }

  test("query_string autocomplete: only the LAST token is a prefix (web/app.py:145)") {
    // 'jam' must match exactly under query_string "{q}*" — no member has
    // the bare token 'jam', so zero hits; the all-prefix variant differs
    val qs = Search.queryStringAutocomplete(members, "jam smi", size = Int.MaxValue).get
    assert(qs.count() == 0)
    val qs2 = Search.queryStringAutocomplete(members, "james smi", size = Int.MaxValue).get
    val expected = members.filter(
      lower(col("firstName")) === "james" && lower(col("lastName")).startsWith("smi"))
    assert(qs2.count() >= expected.count() && expected.count() > 0)
    assert(Search.queryStringAutocomplete(members, "ja").isEmpty) // guard
  }

  test("match-all browse: firstName sort, size 10 (web/app.py:207-215)") {
    val got = Search.matchAll(members, "firstName", size = 10)
      .select("firstName").collect().map(_.getString(0)).toSeq
    assert(got.length == 10)
    assert(got == got.sorted)
    assert(got.head == "Elizabeth") // alphabetically first pool name
  }

  test("upsert by id over the member schema (last write wins)") {
    import spark.implicits._
    val twice = members.limit(50)
      .withColumn("ingestOrder", lit(1L))
      .union(members.limit(50).withColumn("memberStatus", lit("resubmitted"))
        .withColumn("ingestOrder", lit(2L)))
    val deduped = graft.ingest.Upsert.lastWriteWins(twice, "id", Seq("ingestOrder"))
    assert(deduped.count() == 50)
    assert(deduped.filter(col("memberStatus") === "resubmitted").count() == 50)
  }

  test("nullable fields follow the reference's sparsity contract") {
    val n = members.count().toDouble
    val a2 = members.filter(col("addressLine2").isNull).count() / n
    assert(a2 > 0.5 && a2 < 0.9) // ~70% null (testDataCreate.py:41)
    assert(members.filter(col("dateOfBirth") === "").count() == n.toLong) // kept edge case
  }
}
