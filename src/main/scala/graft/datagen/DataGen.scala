package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.pack_bits

/** Spark-native corpus generators — the reference's dataset factory
  * (/root/reference/bigvectorbench/datasets.py:332-453 random_float /
  * random_bitstring / random_jaccard / random_filter / random_mv)
  * re-expressed for scale: every value is a pure column expression
  * over a counter-based hash of (seed, row id, stream), so generation
  * is
  *  - deterministic for a given (seed, params) regardless of
  *    partitioning or cluster size (no per-partition RNG state),
  *  - embarrassingly parallel from `spark.range(n)` (each of 1000
  *    executors derives its rows independently — generating 100 TB is
  *    one codegen'd projection, no driver data, no shuffle),
  *  - reproducible piecemeal (row i can be regenerated alone).
  *
  * The reference's sklearn make_blobs semantics (Gaussian clusters
  * around uniform centers) are kept: cluster = id mod centers, center
  * coordinates uniform in [-10, 10], unit-variance Gaussian noise via
  * Box-Muller over two hash-uniforms. The train/test split is
  * id-deterministic (id % 10 == 0 → test, the reference's 0.1
  * test_size) so split sizes are exactly derivable.
  */
object DataGen {

  /** Uniform in [0, 1) from (seed, a, b) — 40 mantissa bits of
    * xxhash64, plenty for synthetic corpora.
    */
  private def u(seed: Long, a: Column, b: Column): Column =
    pmod(xxhash64(lit(seed), a, b), lit(1L << 40)).cast("double") /
      lit((1L << 40).toDouble)

  /** Standard normal via Box-Muller from two independent uniforms. */
  private def gaussian(seed: Long, a: Column, b: Column): Column =
    sqrt(lit(-2.0) * log(greatest(u(seed, a, b), lit(1e-12)))) *
      cos(lit(2.0 * math.Pi) * u(seed + 77, a, b))

  private def ids(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).withColumnRenamed("id", "vec_id")

  /** The test_size=0.1 split — delegated to [[graft.queries.Split]]
    * so the generator and the query-side predicates can never drift.
    */
  private val isTrain: Column = graft.queries.Split.isTrain(col("vec_id"))

  /** Blob-clustered float vectors (make_blobs): cluster id mod
    * `centers`, centers uniform in [-10, 10]^dims, sigma-1 Gaussian
    * noise. Columns: vec_id, label (the cluster), embedding
    * array<float>, is_train.
    */
  def randomFloat(spark: SparkSession, n: Long, dims: Int, centers: Int,
      seed: Long = 1L): DataFrame = {
    val cluster = pmod(col("vec_id"), lit(centers.toLong))
    ids(spark, n)
      .withColumn("label", cluster.cast("int"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dims - 1)), i =>
          (u(seed ^ 0xC0FFEEL, col("label").cast("long"), i) * 20 - 10 +
            gaussian(seed, col("vec_id"), i)).cast("float")))
      .withColumn("is_train", isTrain)
  }

  /** Sign-binarised blobs packed into array<long> words — the
    * reference's random_bitstring (datasets.py:343), stored natively
    * packed so hamming scans are XOR + popcount.
    */
  def randomBitstring(spark: SparkSession, n: Long, dims: Int,
      centers: Int, seed: Long = 1L): DataFrame =
    randomFloat(spark, n, dims, centers, seed)
      .withColumn("bits", pack_bits(col("embedding"), 64))
      .select("vec_id", "label", "bits", "is_train")

  /** Random size-`setSize` subsets of [0, universe) — random_jaccard
    * (datasets.py:355): rank universe elements by a per-row hash,
    * keep the first setSize, emit sorted. O(universe log universe)
    * per row; for very large universes swap the ranking for a
    * hash-threshold sample.
    */
  def randomJaccard(spark: SparkSession, n: Long, setSize: Int,
      universe: Int, seed: Long = 1L): DataFrame = {
    require(setSize <= universe, s"setSize $setSize > universe $universe")
    ids(spark, n)
      .withColumn("elems", array_sort(transform(
        slice(array_sort(transform(sequence(lit(0), lit(universe - 1)),
          e => struct(
            xxhash64(lit(seed), col("vec_id"), e).as("h"),
            e.as("e")))), 1, setSize),
        s => s.getField("e"))))
      .withColumn("is_train", isTrain)
  }

  /** Blobs + nFilters int label columns uniform in [0, 100) — the
    * compound-filter corpus (random_filter, datasets.py:369-410);
    * query-side threshold tuples come from the same columns on test
    * rows.
    */
  def randomFilter(spark: SparkSession, n: Long, dims: Int, centers: Int,
      nFilters: Int, seed: Long = 1L): DataFrame =
    (0 until nFilters).foldLeft(randomFloat(spark, n, dims, centers, seed)) {
      case (df, i) => df.withColumn(s"label_$i",
        pmod(xxhash64(lit(seed + 1000 + i), col("vec_id")), lit(100L))
          .cast("int"))
    }

  /** 4 independent uniform-[0,1) fields of `fieldDim` dims each —
    * random_mv (datasets.py:412).
    */
  def randomMv(spark: SparkSession, n: Long, fieldDim: Int,
      seed: Long = 1L): DataFrame =
    (0 until 4).foldLeft(ids(spark, n)) { case (df, f) =>
      df.withColumn(s"field_$f",
        transform(sequence(lit(0), lit(fieldDim - 1)), i =>
          u(seed + 31L * f, col("vec_id"), i).cast("float")))
    }.withColumn("is_train", isTrain)

  /** Write a generated corpus as partitioned parquet. numFiles bounds
    * file count at small scale; at 100 TB prefer the default
    * parallelism (drop the repartition) or partitionBy on a coarse
    * bucket of vec_id.
    */
  def write(df: DataFrame, path: String, numFiles: Int = 8): Unit =
    df.repartition(numFiles).write.mode("overwrite").parquet(path)
}
