package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic source-code corpus in the north-rule input shape
  * `(repo: string, path: string, commit: string, lang: string,
  * content: string)` (BASELINE.json input_hint; FIXTURES.md §1).
  *
  * Every column is a pure function of the row index via seeded `xxhash64`,
  * expressed as Catalyst column expressions over `spark.range(n)` — so
  * generation is embarrassingly parallel (no shuffle, no driver-side data),
  * identical across runs, partitionings, and cluster sizes, and would scale
  * to 10^12 rows unchanged. Skew is planted deliberately (one hub repo
  * absorbing ~15% of files and one hub commit shared across a repo's files)
  * to exercise the salting / per-group-cap paths (SURVEY §4.3), mirroring
  * the power-law degrees of the reference's datasets (BTC max degree
  * 1,637,619 — `docs/G-Miner-Eurosys18.pdf` Table 2).
  */
object CorpusGen {

  final case class Scale(rows: Long, repos: Int, orgs: Int,
                         commitsPerRepo: Int, pathsPerRepo: Int)

  /** FIXTURES.md scale knobs. */
  val Tiny: Scale  = Scale(200L, 8, 2, 6, 24)
  val Small: Scale = Scale(20000L, 64, 8, 24, 96)
  val Bench: Scale = Scale(2000000L, 2048, 64, 48, 256)

  /** One file-version row per index. Columns, per FIXTURES.md §1:
    *  - repo: `org{o}/repo{r}`; r is hash-assigned with a planted hub
    *    (repo 0 gets ~15% of all rows — the "monorepo").
    *  - path: synthetic tree `src/d{a}/e{b}/file{k}.{ext}`.
    *  - commit: `c%012x` of hash(repo, commitIdx); commitIdx is skewed
    *    toward low values (hash % ncommits squared-ish) so commit 0 of each
    *    repo is a hub touching many files.
    *  - lang: weighted {scala, java, py, c, md}.
    *  - content: 64–512 printable chars chained from sha2 hex — the
    *    per-row sha256 invariant anchor.
    */
  def corpus(spark: SparkSession, scale: Scale, seed: Long = 42L): DataFrame = {
    val id = col("id")
    def h(salt: Int) = abs(xxhash64(id, lit(seed), lit(salt)))

    // repo assignment: ~15% of rows hit the hub repo 0, rest uniform
    val rIdx = when(h(1) % 100 < 15, lit(0L))
      .otherwise(h(2) % scale.repos)
    val repo = concat(lit("org"), rIdx % scale.orgs, lit("/repo"), rIdx)

    // path tree; ~pathsPerRepo distinct paths per repo
    val pIdx = h(3) % scale.pathsPerRepo
    val ext = element_at(
      typedlit(Seq("scala", "java", "py", "c", "md")),
      (pmod(h(4), lit(5)) + 1).cast("int"))
    val path = concat(lit("src/d"), pIdx % 8, lit("/e"), pIdx % 13,
      lit("/file"), pIdx, lit("."), ext)

    // commit index skewed to low values: square a uniform in [0,1)
    val u = (h(5) % 1000L).cast("double") / 1000.0
    val cIdx = (u * u * scale.commitsPerRepo).cast("long")
    val commit = concat(lit("c"),
      lpad(hex(abs(xxhash64(repo, cIdx, lit(seed)))).substr(1, 12), 12, "0"))

    val lang = ext

    // 64–512 printable chars: chain of sha2 hex blocks, cut to length
    val blocks = concat((0 until 8).map(i =>
      sha2(concat_ws("|", lit("content"), id.cast("string"),
        lit(seed.toString), lit(i.toString)), 256)): _*)
    val contentLen = (lit(64) + h(6) % 449L).cast("int")
    val content = substring(blocks, 1, 512).substr(lit(1), contentLen)

    spark.range(scale.rows).select(
      repo.as("repo"), path.as("path"), commit.as("commit"),
      lang.as("lang"), content.as("content"))
  }
}
