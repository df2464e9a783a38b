package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Thin table-catalog seam (SURVEY §7.4.2).
  *
  * At production scale every durable table (corpus, vertices, edges, adj,
  * iteration checkpoints, metrics) lives in an Iceberg catalog:
  * `spark.table(name)` / `df.writeTo(name).createOrReplace()/append()`,
  * with snapshot ids giving incremental derivation and time travel. No
  * Iceberg jars exist in this offline sandbox, so the same five-method
  * contract is implemented over parquet directories with an atomic
  * rename-commit and a `_snapshots.jsonl` log — semantically the subset of
  * Iceberg the engine relies on (atomic replace, append as new snapshot,
  * read-latest, list-snapshots). Swapping in Iceberg is a one-class change;
  * nothing else in the engine touches storage paths.
  */
trait CatalogAdapter {
  def createOrReplace(name: String, df: DataFrame): Long
  def append(name: String, df: DataFrame): Long
  def read(spark: SparkSession, name: String): DataFrame
  def readSnapshot(spark: SparkSession, name: String, snapshot: Long): DataFrame
  def snapshots(name: String): Seq[Long]

  /** Iceberg-style DELETE: commit a NEW snapshot holding the current rows
    * that do NOT match `cond`; prior snapshots stay time-travelable. This
    * is the table-layer home of the reference demo's drill-down deletions
    * (`core/master.tpp:30-110`: a resumed run recomputes with removed
    * nodes/edges applied) — delete the rows, re-run the kernel from the
    * new snapshot. */
  def deleteWhere(spark: SparkSession, name: String,
                  cond: org.apache.spark.sql.Column): Long = {
    // SQL DELETE semantics: remove rows where cond IS TRUE; a NULL
    // predicate keeps the row (a bare !cond would silently drop it)
    val remaining = read(spark, name)
      .filter(!org.apache.spark.sql.functions.coalesce(cond,
        org.apache.spark.sql.functions.lit(false)))
    createOrReplace(name, remaining)
  }

  /** Iceberg-style MERGE INTO (upsert by key): commit a NEW snapshot
    * where rows of `updates` REPLACE current rows sharing their `key`
    * and keys absent from the table INSERT; untouched rows carry over.
    * (MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT —
    * the write path of any SCD/refresh pipeline.) One anti-join + one
    * union; prior snapshots stay time-travelable. `updates` must carry
    * the table schema and at most one row per key (enforced by the
    * caller, as in Iceberg). */
  def merge(spark: SparkSession, name: String, updates: DataFrame,
            key: String): Long = {
    val cur = read(spark, name)
    val kept = cur.join(
      updates.select(org.apache.spark.sql.functions.col(key)),
      Seq(key), "left_anti")
    createOrReplace(name, kept.unionByName(updates))
  }

  /** Iceberg-style compaction (rewrite data files): commit a NEW snapshot
    * with the SAME content as the latest, rewritten into `files` output
    * files — the table-maintenance pass a long-lived append-heavy table
    * needs (an appended chain accumulates one file set per commit; reads
    * pay the union). Content is bit-identical, prior snapshots remain
    * time-travelable, and the new snapshot has no parents (its own files
    * carry everything). */
  def compact(spark: SparkSession, name: String, files: Int = 1): Long =
    createOrReplace(name, read(spark, name).repartition(files))
}

/** Parquet + snapshot-log implementation (local stand-in for Iceberg). */
final class LocalCatalog(root: String) extends CatalogAdapter {
  Files.createDirectories(Paths.get(root))

  private def tableDir(name: String): Path = Paths.get(root, name)
  private def log(name: String): Path = tableDir(name).resolve("_snapshots.jsonl")
  private def refLog(name: String): Path = tableDir(name).resolve("_refs.jsonl")

  private def commit(name: String, df: DataFrame,
                     parents: Seq[Long],
                     advance: Option[String] = None): Long = {
    val dir = tableDir(name)
    Files.createDirectories(dir)
    val snap = snapshots(name).maxOption.getOrElse(0L) + 1L
    val tmp = dir.resolve(f"_tmp_$snap%06d")
    df.write.mode("overwrite").parquet(tmp.toString)
    val dst = dir.resolve(f"snap_$snap%06d")
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
    // the log line is the commit point (written last, append-only)
    val line = s"""{"snapshot":$snap,"parents":[${parents.mkString(",")}]}"""
    Files.write(log(name), java.util.List.of(line),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    // branch bookkeeping: a main-line commit on a branched table advances
    // "main"; a branch commit advances only its own ref. Unbranched
    // tables never touch the ref log — legacy behavior is bit-identical.
    advance.orElse(if (refs(name).contains("main")) Some("main") else None)
      .foreach(r => writeRef(name, r, snap))
    snap
  }

  // ---- Iceberg-style named refs (branches) ----
  //
  // `_refs.jsonl` is append-only, last line per ref wins (the same
  // commit-point discipline as the snapshot log). Creating the FIRST
  // branch pins "main" to the current head, so branch commits — which
  // allocate globally-increasing snapshot ids in the shared log — can
  // never change what the default read resolves. WAP (write-audit-
  // publish) is the use case: stage an experimental append on a branch,
  // audit it, fast-forward main only when it passes.

  private def writeRef(name: String, ref: String, snap: Long): Unit =
    Files.write(refLog(name),
      java.util.List.of(s"""{"ref":"$ref","snapshot":$snap}"""),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  /** Current ref heads (empty for never-branched tables). */
  def refs(name: String): Map[String, Long] =
    if (!Files.exists(refLog(name))) Map.empty
    else Files.readAllLines(refLog(name)).asScala.flatMap { l =>
      """"ref":"([^"]+)","snapshot":(\d+)""".r.findFirstMatchIn(l)
        .map(m => m.group(1) -> m.group(2).toLong)
    }.toMap

  /** Create branch `ref` at the current head (pinning "main" there too
    * if this is the table's first branch). Returns the head snapshot. */
  // ref names are interpolated into the JSON ref log unescaped; a name
  // with a quote would write a line the refs() regex skips — silently
  // losing the branch head. Fail loudly at the API boundary instead.
  private def validRef(ref: String): String = {
    require(ref.matches("[A-Za-z0-9._-]+"),
      s"invalid ref name '$ref': must match [A-Za-z0-9._-]+")
    ref
  }

  def branch(name: String, ref: String): Long = {
    validRef(ref)
    val head = snapshots(name).maxOption
      .getOrElse(sys.error(s"no committed snapshot for table $name"))
    if (!refs(name).contains("main")) writeRef(name, "main", head)
    writeRef(name, ref, head)
    head
  }

  /** Append onto a named ref: the new snapshot's lineage is the ref
    * head's chain, and only that ref advances. */
  def appendTo(name: String, ref: String, df: DataFrame): Long = {
    val head = refs(name).getOrElse(validRef(ref),
      sys.error(s"unknown ref $ref for table $name"))
    commit(name, df, parentsOf(name, head) :+ head, advance = Some(ref))
  }

  /** Read a named ref's head (time travel by branch). */
  def readRef(spark: SparkSession, name: String, ref: String): DataFrame =
    readSnapshot(spark, name, refs(name).getOrElse(ref,
      sys.error(s"unknown ref $ref for table $name")))

  override def createOrReplace(name: String, df: DataFrame): Long =
    commit(name, df, Seq.empty)

  /** Append = new snapshot whose lineage is the current MAIN-LINE head's
    * chain (its parents + itself) — not every prior snapshot, which would
    * union replaced-away data back in after a createOrReplace. On a
    * branched table the main line is the "main" ref (the latest snapshot
    * may be a branch commit); otherwise it is the latest snapshot. */
  override def append(name: String, df: DataFrame): Long = {
    val head = refs(name).get("main").orElse(snapshots(name).maxOption)
    val parents = head.map(h => parentsOf(name, h) :+ h).getOrElse(Seq.empty)
    commit(name, df, parents)
  }

  override def read(spark: SparkSession, name: String): DataFrame =
    // a branched table's default read follows the "main" ref (branch
    // commits share the snapshot log, so read-latest would leak them);
    // never-branched tables keep the legacy read-latest
    refs(name).get("main") match {
      case Some(head) => readSnapshot(spark, name, head)
      case None =>
        val snaps = snapshots(name)
        require(snaps.nonEmpty, s"no committed snapshot for table $name")
        readSnapshot(spark, name, snaps.max)
    }

  /** Recorded parent chain of a snapshot. */
  private def parentsOf(name: String, snapshot: Long): Seq[Long] =
    Files.readAllLines(log(name)).asScala.flatMap { l =>
      val m = """"snapshot":(\d+),"parents":\[([0-9,]*)\]""".r
        .findFirstMatchIn(l)
      m.filter(_.group(1).toLong == snapshot)
        .map(_.group(2).split(",").filter(_.nonEmpty).map(_.toLong).toSeq)
    }.headOption.getOrElse(Seq.empty)

  /** A snapshot's content = its own files plus (for appends) its parents'.
    * `mergeSchema` gives Iceberg-style ADD COLUMN evolution: an append
    * whose schema has extra columns widens the table and back-fills prior
    * rows with null on read (real Iceberg resolves the schema from table
    * metadata instead of file footers; this local stand-in pays one
    * footer read per file, fine at its scale). */
  override def readSnapshot(spark: SparkSession, name: String,
                            snapshot: Long): DataFrame = {
    val dirs = (parentsOf(name, snapshot) :+ snapshot).distinct.sorted
      .map(s => tableDir(name).resolve(f"snap_$s%06d").toString)
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  override def snapshots(name: String): Seq[Long] =
    if (!Files.exists(log(name))) Seq.empty
    else Files.readAllLines(log(name)).asScala.toSeq
      .flatMap(l => """"snapshot":(\d+)""".r.findFirstMatchIn(l)
        .map(_.group(1).toLong))
      .filter(s => Files.exists(tableDir(name).resolve(f"snap_$s%06d")))

  /** Iceberg-style expire_snapshots (table maintenance): drop history
    * older than the newest `keep` snapshots, RETAINING any snapshot a
    * kept one still reads through (append parents — Iceberg's file-
    * reachability rule), so kept reads never lose data files. The usual
    * flow is compact-then-expire: compaction commits a self-contained
    * snapshot with no parents, after which the whole prior chain is
    * expirable. The log is rewritten first (the commit point), then the
    * unreachable snapshot dirs are deleted; time travel to an expired id
    * now fails, kept ids are untouched. Returns expired ids. */
  def expireSnapshots(name: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the latest snapshot")
    val snaps = snapshots(name).sorted
    // ref heads are GC roots exactly like the newest snapshots (Iceberg
    // retains any snapshot a branch still points at)
    val roots = snaps.takeRight(keep).toSet ++ refs(name).values
    val kept = roots ++ roots.flatMap(s => parentsOf(name, s))
    val expired = snaps.filterNot(kept)
    if (expired.nonEmpty) {
      val lines = Files.readAllLines(log(name)).asScala.filter { l =>
        """"snapshot":(\d+)""".r.findFirstMatchIn(l)
          .exists(m => kept(m.group(1).toLong))
      }
      Files.write(log(name), lines.asJava,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      expired.foreach { s =>
        val dir = tableDir(name).resolve(f"snap_$s%06d")
        if (Files.exists(dir))
          Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
      }
    }
    expired
  }
}
