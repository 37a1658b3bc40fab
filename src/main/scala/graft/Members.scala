package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Member record mirroring the reference's 33-column test-data schema
  * (reference testdata/testDataCreate.py:27, :199-233; FIXTURES.md §2) —
  * the ingestion-surface parity fixture for coercion, upsert, term
  * search, autocomplete, and match-all semantics.
  */
case class Member(
    id: String,
    memberId: String, groupId: String, objectId: String, subjectId: String,
    firstName: String, lastName: String, middleName: String,
    addressLine1: String, addressLine2: String, city: String, state: String,
    zipcode: String, country: String,
    phoneNumber1: String, phoneNumber2: String, email1: String, email2: String,
    objectName: String, subjectName: String, fatherName: String, motherName: String,
    dateOfBirth: String, // empty string in the reference generator (testDataCreate.py:57)
    gender: String, maritalStatus: String, employmentStatus: String,
    memberStatus: String, preferredLanguage: String,
    policyNumber: String,
    coverageStartDate: String, coverageEndDate: String,
    createdAt: String, updatedAt: String)

/** Deterministic seeded member generator (reference name pools,
  * testDataCreate.py:11-21). Pure function of (seed, id) — same
  * parallelism-independence contract as Corpus.
  */
object Members {

  private val firstNames = Array("James", "Mary", "John", "Patricia", "Robert",
    "Jennifer", "Michael", "Linda", "William", "Elizabeth")
  private val lastNames = Array("Smith", "Johnson", "Williams", "Brown", "Jones",
    "Garcia", "Miller", "Davis", "Rodriguez", "Martinez")
  private val cities = Array("Springfield", "Rivertown", "Lakeside", "Hillview", "Brookfield")
  private val states = Array("CA", "NY", "TX", "FL", "WA")
  private val genders = Array("M", "F", "O")
  private val maritals = Array("single", "married", "divorced", "widowed")
  private val employments = Array("employed", "unemployed", "retired", "student")
  private val statuses = Array("active", "inactive", "pending")
  private val languages = Array("en", "es", "fr", "de")

  @inline private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private val FixedNow = "2025-05-23T00:00:00Z" // injected constant (no wall-clock)

  def member(seed: Long, i: Long): Member = {
    var state0 = mix(seed ^ mix(i))
    def next(): Long = { state0 = mix(state0); state0 }
    def pick(a: Array[String]): String = a(math.floorMod(next(), a.length.toLong).toInt)
    def uuidish(tag: String): String = f"$tag-${next() & 0xffffffffL}%08x-$i%06d"

    val first = pick(firstNames)
    val last = pick(lastNames)
    val addr2 = if (math.floorMod(next(), 10L) < 7) null else s"Apt ${math.floorMod(next(), 900L) + 100}"
    val phone2 = if (math.floorMod(next(), 2L) == 0) null else f"555-${math.floorMod(next(), 10000L)}%04d"
    val email2 = if (math.floorMod(next(), 10L) < 6) null
      else s"${first.toLowerCase}.alt$i@example.org"
    Member(
      id = uuidish("id"),
      memberId = uuidish("mem"), groupId = uuidish("grp"),
      objectId = uuidish("obj"), subjectId = uuidish("sub"),
      firstName = first, lastName = last, middleName = pick(firstNames),
      addressLine1 = s"${math.floorMod(next(), 9000L) + 1000} Main St",
      addressLine2 = addr2,
      city = pick(cities), state = pick(states),
      zipcode = f"${math.floorMod(next(), 90000L) + 10000}%05d", country = "US",
      phoneNumber1 = f"555-${math.floorMod(next(), 10000L)}%04d", phoneNumber2 = phone2,
      email1 = s"${first.toLowerCase}.${last.toLowerCase}$i@example.org", email2 = email2,
      objectName = s"object${math.floorMod(next(), 100L)}",
      subjectName = s"subject${math.floorMod(next(), 100L)}",
      fatherName = pick(firstNames) + " " + pick(lastNames),
      motherName = pick(firstNames) + " " + pick(lastNames),
      dateOfBirth = "", // reference edge case kept
      gender = pick(genders), maritalStatus = pick(maritals),
      employmentStatus = pick(employments), memberStatus = pick(statuses),
      preferredLanguage = pick(languages),
      policyNumber = f"POL${math.floorMod(next(), 1000000L)}%06d",
      coverageStartDate = "2024-01-01", coverageEndDate = "2026-01-01",
      createdAt = FixedNow, updatedAt = FixedNow)
  }

  def members(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).map(i => member(seed, i)).toDF()
  }
}
