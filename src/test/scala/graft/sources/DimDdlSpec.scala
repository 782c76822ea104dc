package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimDdlSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (String, String, String)*) =
    rows.toSeq.toDF("id", "name", "birthday")
      .select(map(lit("id"), col("id"), lit("name"), col("name"),
        lit("birthday"), col("birthday")).as("data_pruned"))

  private def dropClean(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${DimDdl.SchemaName}.`$name`")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      s"${DimDdl.SchemaName}.db", name)
    if (java.nio.file.Files.exists(loc))
      org.apache.commons.io.FileUtils.deleteDirectory(loc.toFile)
  }

  test("config-driven CREATE TABLE IF NOT EXISTS + keyed upsert (last write wins)") {
    dropClean("dim_user_info_t")
    DimDdl.ensureTable(spark, "dim_user_info_t", "id,name,birthday", "id")
    DimDdl.ensureTable(spark, "dim_user_info_t", "id,name,birthday", "id") // idempotent
    val t = s"${DimDdl.SchemaName}.`dim_user_info_t`"
    assert(spark.table(t).columns.toSeq == Seq("id", "name", "birthday", "pk_bucket"))

    DimDdl.upsert(spark, "dim_user_info_t", "id",
      batch(("u1", "alice", "1990-01-01"), ("u2", "bob", "1991-01-01")))
    DimDdl.upsert(spark, "dim_user_info_t", "id", batch(("u1", "alice2", "1990-01-01")))

    val byId = spark.table(t).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId == Map("u1" -> "alice2", "u2" -> "bob"))
    spark.sql(s"DROP TABLE $t")
  }

  test("rows with a null primary key are skipped, not crashed on") {
    dropClean("dim_nullpk_t")
    DimDdl.ensureTable(spark, "dim_nullpk_t", "id,name,birthday", "id")
    val t = s"${DimDdl.SchemaName}.`dim_nullpk_t`"
    // second row's map has no "id" entry -> null pk
    val rows = Seq(("u1", "alice", "1990-01-01")).toDF("id", "name", "birthday")
      .select(map(lit("id"), col("id"), lit("name"), col("name"),
        lit("birthday"), col("birthday")).as("data_pruned"))
      .union(Seq(("ghost", "2000-01-01")).toDF("name", "birthday")
        .select(map(lit("name"), col("name"),
          lit("birthday"), col("birthday")).as("data_pruned")))
    DimDdl.upsert(spark, "dim_nullpk_t", "id", rows)
    assert(spark.table(t).collect().map(_.getString(0)).toSeq == Seq("u1"))
    spark.sql(s"DROP TABLE $t")
  }

  test("forced replay of an upsert batch leaves the dim table identical") {
    dropClean("dim_replay_t")
    DimDdl.ensureTable(spark, "dim_replay_t", "id,name,birthday", "id")
    val t = s"${DimDdl.SchemaName}.`dim_replay_t`"
    DimDdl.upsert(spark, "dim_replay_t", "id",
      batch(("u1", "alice", "1990-01-01"), ("u2", "bob", "1991-01-01")))
    // the batch that will replay, including an intra-batch pk conflict
    // (two writes to u3) whose winner must be replay-stable
    val b1 = batch(("u1", "alice2", "1990-01-01"),
      ("u3", "carol-x", "1992-01-01"), ("u3", "carol-y", "1992-01-01"))
    DimDdl.upsert(spark, "dim_replay_t", "id", b1)
    def rows(): Seq[String] = spark.table(t).collect().map(_.toString).toSeq.sorted
    val before = rows()
    // forced replay: the same micro-batch re-runs after a failure between
    // the upsert and the streaming checkpoint commit — the keyed overwrite
    // must converge to the same rows (same winners, same buckets)
    DimDdl.upsert(spark, "dim_replay_t", "id", b1)
    assert(rows() == before, "replayed upsert changed the dim table")
    val byId = spark.table(t).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId == Map("u1" -> "alice2", "u2" -> "bob", "u3" -> "carol-y"),
      "payload-ranked intra-batch winner must be deterministic across replays")
    spark.sql(s"DROP TABLE $t")
  }

  test("incremental upsert rewrites only the touched pk-buckets' files") {
    dropClean("dim_incr_t")
    DimDdl.ensureTable(spark, "dim_incr_t", "id,name,birthday", "id")
    val t = s"${DimDdl.SchemaName}.`dim_incr_t`"
    // pick ids that land in different buckets so batch 2 leaves some alone
    val ids = (1 to 40).map(i => s"u$i")
    val buckets = ids.map(id => id ->
      spark.range(1).select(DimDdl.bucketOf(lit(id))).head.getInt(0)).toMap
    val (idA, idB) = {
      val distinct = ids.groupBy(buckets).values.map(_.head).toSeq
      (distinct(0), distinct(1)) // two ids in two different buckets
    }
    DimDdl.upsert(spark, "dim_incr_t", "id",
      batch((idA, "a-v1", "1990-01-01"), (idB, "b-v1", "1991-01-01")))

    def filesByBucket(): Map[Int, Set[String]] =
      spark.table(t).select(col("pk_bucket"), input_file_name().as("f"))
        .distinct().collect()
        .groupBy(_.getInt(0)).map { case (b, rs) => b -> rs.map(_.getString(1)).toSet }

    val before = filesByBucket()
    assert(before.keySet == Set(buckets(idA), buckets(idB)))

    // batch 2 touches only idA's bucket
    DimDdl.upsert(spark, "dim_incr_t", "id", batch((idA, "a-v2", "1990-01-01")))
    val after = filesByBucket()

    // untouched bucket: identical files (not rewritten); touched: new files
    assert(after(buckets(idB)) == before(buckets(idB)),
      "untouched bucket was rewritten")
    assert(after(buckets(idA)) != before(buckets(idA)),
      "touched bucket should have new files")
    // values: idA updated, idB untouched
    val byId = spark.table(t).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId == Map(idA -> "a-v2", idB -> "b-v1"))
    spark.sql(s"DROP TABLE $t")
  }
}
