package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A row of the engine's input corpus: one source file at one commit.
  * Shape fixed by the engine contract: an Iceberg/Parquet table of
  * source-code repositories `(repo, path, commit, lang, content)`.
  */
final case class CorpusRow(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** Corpus ingestion: deterministic synthetic generation (for tests and
  * benchmarks — no external data), sha256 stamping, and the per-row
  * invariant column carried through every downstream stage.
  *
  * The generator is expressed entirely in Catalyst expressions over
  * `spark.range(n)` — no driver-side loops, no RNG state — so it
  * generates any scale fully distributed and byte-identically at any
  * parallelism level.
  */
object Corpus {

  val Langs: Seq[String] = Seq("scala", "py", "c")

  /** Deterministic synthetic corpus of `n` files across `repos` repos.
    *
    * File i defines module `Mod_i` and imports `deg(i)` other modules,
    * where `deg` follows a skewed (Zipf-ish) distribution and targets
    * are biased toward low file ids — so hub files with very high
    * in-degree exist at every scale (skew coverage for the resolution
    * join and for PageRank/CC message aggregation).
    *
    * Every field is a pure function of (i, seed): same output at
    * local[1] and local[32], any partition count.
    */
  def synthetic(
      spark: SparkSession,
      n: Long,
      repos: Int = 50,
      maxDegree: Int = 12,
      seed: Long = 42L
  ): Dataset[CorpusRow] = {
    import spark.implicits._
    require(n > 0 && repos > 0 && maxDegree >= 0)

    val id = col("id")
    // Deterministic per-(i,k) pseudo-random in [0,1): xxhash64 of the
    // tuple, folded to 20 bits.
    def u01(cols: org.apache.spark.sql.Column*) =
      pmod(xxhash64(cols: _*), lit(1048576L)).cast("double") / lit(1048576.0)

    val langIdx = pmod(xxhash64(id, lit(seed), lit("lang")), lit(3)).cast("int")
    val lang = element_at(lit(Langs.toArray), langIdx + 1)
    val repoId = pmod(xxhash64(id, lit(seed), lit("repo")), lit(repos.toLong))

    // Degree: floor(maxDegree * u^2) -> most files import few, some many.
    val deg = floor(lit(maxDegree) * pow(u01(id, lit(seed), lit("deg")), 2.0)).cast("int")
    // Targets: bias toward low ids (hubs): floor(n * u^3), excluding self.
    val targets = transform(
      sequence(lit(0), deg - 1),
      k => {
        val t = floor(lit(n.toDouble) * pow(u01(id, k, lit(seed), lit("tgt")), 3.0)).cast("long")
        when(t === id, (t + 1) % lit(n)).otherwise(t)
      }
    )

    val importLine = (m: org.apache.spark.sql.Column) =>
      when(lang === "scala", concat(lit("import graftmod.Mod_"), m))
        .when(lang === "py", concat(lit("from graftmod import mod_"), m))
        .otherwise(concat(lit("#include \"mod_"), m, lit(".h\"")))

    val body = concat(
      lit("// synthetic corpus file "), id, lit("\n"),
      array_join(transform(targets, importLine), "\n"), lit("\n"),
      lit("object Mod_"), id, lit(" { val payload = \""),
      sha2(concat(id.cast("string"), lit(seed.toString)), 256), lit("\" }\n")
    )

    val ext = when(lang === "scala", lit("scala")).when(lang === "py", lit("py")).otherwise(lit("c"))

    spark
      .range(0, n)
      .select(
        concat(lit("repo-"), repoId).as("repo"),
        concat(lit("src/m"), pmod(id, lit(97L)), lit("/Mod_"), id, lit("."), ext).as("path"),
        concat(lit("c"), lpad(pmod(xxhash64(id, lit(seed), lit("commit")), lit(100000000L)).cast("string"), 8, "0")).as("commit"),
        lang.as("lang"),
        body.as("content")
      )
      .as[CorpusRow]
  }

  /** Stamp the per-row invariant: content sha256 + a stable 64-bit vertex
    * id derived from the file identity. The `content_sha` column must
    * survive every checkpoint byte-identical (verified end-to-end in
    * tests). Cited reference precedent: the reference casts ids to str
    * defensively everywhere (create_field/graph.py:25-26); we instead fix
    * identity once at ingest.
    */
  def stamped(corpus: Dataset[CorpusRow]): DataFrame =
    corpus.toDF()
      .withColumn("content_sha", sha2(col("content"), 256))
      .withColumn(
        "file_id",
        xxhash64(concat_ws("@", concat_ws("/", col("repo"), col("path")), col("commit")))
      )
}
