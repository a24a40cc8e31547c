package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupFeatureStore

/** The persisted dedup feature store: cross-session round trip,
  * replay idempotence, frozen-blocklist discipline. */
class DedupStoreSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def words(seed: Int, n: Int) =
    (0 until n).map(i => s"w${(seed * 31 + i * 7) % 97}tok$i").mkString(" ")

  test("store round trip: a fresh load sees prior folds (cross-session re-crawl)") {
    val path = "/tmp/graft_spec_store_rt"
    val seed = Seq((1L, words(1, 30)), (2L, words(2, 30))).toDF("doc_id", "text")
    val s1 = DedupFeatureStore.build(seed, path)
    // batch A folds a new doc 101 into the store
    s1.fold(Seq((101L, words(7, 30))).toDF("doc_id", "text"), 0L).collect()

    // "days later, another session": a pure-disk load — no shared
    // object state with s1 — must verdict against seed ∪ batch A
    val s2 = DedupFeatureStore.load(spark, path)
    val nearOf101 = words(7, 30).replace("tok3", "edit3")
    val v = s2.fold(
        Seq((201L, nearOf101), (202L, words(1, 30))).toDF("doc_id", "text"), 1L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(v(201L) == ("near_dup", 101L),
      "near-dup of a PRIOR FOLD's doc, found through the loaded store")
    assert(v(202L) == ("exact_dup", 1L), "exact-dup of a seed doc")
  }

  test("replay idempotence: re-folding a generation neither changes " +
      "the verdict nor duplicates features") {
    val path = "/tmp/graft_spec_store_replay"
    val seed = Seq((1L, words(1, 30)), (2L, words(2, 30))).toDF("doc_id", "text")
    val store = DedupFeatureStore.build(seed, path)
    val batch = Seq((100L, words(2, 30).replace("tok5", "edit5")),
      (101L, words(9, 30))).toDF("doc_id", "text")
    def verdictSet() = store.fold(batch, 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val first = verdictSet()
    val genRows = spark.read.parquet(s"$path/shingles")
      .filter(col("ingest_gen") === 0).count()
    // the at-least-once replay: same batch id, same verdict, the
    // generation's partition is REPLACED, not appended to
    val replay = verdictSet()
    assert(replay == first, "replayed fold re-emits the same verdicts")
    assert(spark.read.parquet(s"$path/shingles")
      .filter(col("ingest_gen") === 0).count() == genRows,
      "replay overwrote its generation instead of duplicating it")
    // and a later batch verdicts against exactly one copy of 100/101
    val v2 = store.fold(
        Seq((200L, words(9, 30).replace("tok2", "edit2"))).toDF("doc_id", "text"),
        1L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(v2(200L) == ("near_dup", 101L))
  }

  test("frozen blocklist: a shingle frequent in the SEED is excluded " +
      "from every later batch's features") {
    val path = "/tmp/graft_spec_store_freq"
    // 120 seed docs all containing the bigram "hot pepper" → its seed
    // df (120) exceeds MaxDf (100) → frozen into the blocklist; each
    // doc also has a unique tail so docs aren't near-dups of each other
    val seed = (1L to 120L).map(i =>
        (i, s"hot pepper ${words(i.toInt + 50, 12)}"))
      .toDF("doc_id", "text")
    val store = DedupFeatureStore.build(seed, path)
    assert(spark.read.parquet(s"$path/frequent").count() >= 1,
      "seed-frequent shingle entered the blocklist")
    // a batch doc made ONLY of the frequent shingle: zero usable
    // features → 'new' (the blocked shingle can neither bucket nor
    // verify), and its sizes row is 0
    val v = store.fold(Seq((500L, "hot pepper")).toDF("doc_id", "text"), 0L)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(v(500L) == ("new", -1L),
      "a doc of only blocklisted shingles matches nothing in the near layer")
    val n = spark.read.parquet(s"$path/sizes")
      .filter(col("ingest_gen") === 0 && col("doc_id") === 500L)
      .select("n").collect()
    assert(n.isEmpty || n.head.getLong(0) == 0L,
      "frozen blocklist removed the batch doc's only shingle")
  }

  test("registered dedup_store_fold equals dedup_ingest_fold when no " +
      "shingle's df crosses the cap between seed and full corpus") {
    // at sf0.001 no bigram approaches MaxDf=100, so the frozen-cap
    // store fold and the global-cap memoized fold must agree row-for-row
    val d = "/root/testdata/sf0.001"
    val viaStore = DedupFeatureStore.storeFold(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    val viaMemo = graft.operators.DedupOps.ingestFold(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(viaStore == viaMemo)
  }
}
