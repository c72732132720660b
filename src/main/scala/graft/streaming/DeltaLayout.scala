package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * The shared delta-slice layout under a streaming root — one place for
 * the naming, liveness, commit, and GC rules the streaming surfaces
 * ([[StreamIndex]], [[StreamEdges]]) follow:
 *
 *  - `delta=b<batchId>` — one replay-idempotent slice per micro-batch;
 *  - `delta=base` / `delta=base@<N>` — a compacted base GENERATION that
 *    folded every batch id ≤ N (bare `delta=base` predates all, N = −1);
 *  - the LIVE set is the newest base generation plus only the batch
 *    slices newer than what it folded;
 *  - a fold COMMITS with one rename of an ignored staging name to the
 *    next generation, so readers flip atomically and a crash at any
 *    point leaves a correct live set (stale dirs are garbage the next
 *    [[gcStale]] sweeps);
 *  - every list/rename/delete goes through Hadoop FileSystem with
 *    CHECKED results (rename/delete report failure by returning false).
 */
object DeltaLayout {

  val Staging = "compact.staging"

  private val BatchName = "delta=b(\\d+)".r

  /** A base dir's folded-through batch id, if the name is a base. */
  def baseGen(name: String): Option[Long] = name match {
    case "delta=base" => Some(-1L)
    case s if s.startsWith("delta=base@") =>
      scala.util.Try(s.stripPrefix("delta=base@").toLong).toOption
    case _ => None
  }

  /** A batch slice's id, if the name is one. */
  def batchId(name: String): Option[Long] = name match {
    case BatchName(id) => Some(id.toLong)
    case _ => None
  }

  def fileSystem(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** The LIVE slice dirs (paths as strings, sorted). */
  def liveDirs(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new Path(root)
    val fs = fileSystem(spark, root)
    if (!fs.exists(rootPath)) return Seq.empty
    val dirs = fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath).toSeq
    val bases = dirs.flatMap(p => baseGen(p.getName).map(_ -> p))
    val live =
      if (bases.isEmpty) dirs.filter(p => batchId(p.getName).isDefined)
      else {
        val (gen, basePath) = bases.maxBy(_._1)
        basePath +: dirs.filter(p => batchId(p.getName).exists(_ > gen))
      }
    live.map(_.toString).sorted
  }

  /** Write `df` as the slice `root/<sliceName>`, committed with ONE
    * rename from a staging name no reader ever parses as a slice —
    * replay-idempotent (an existing slice makes the write a checked
    * no-op; returns false) and crash-atomic at every point. The generic
    * form of the IVF index's slice append, shared by every
    * batch-id-addressed output under a delta root. */
  def writeSlice(df: org.apache.spark.sql.DataFrame, root: String,
      sliceName: String, partitionCols: Seq[String] = Nil,
      markerFile: Option[(String, String)] = None): Boolean = {
    val spark = df.sparkSession
    val fs = fileSystem(spark, root)
    val target = new Path(s"$root/$sliceName")
    if (fs.exists(target)) return false
    val staging = new Path(s"$root/$sliceName.staging")
    if (fs.exists(staging) && !fs.delete(staging, true))
      throw new IllegalStateException(s"cannot clear stale staging $staging")
    val writer = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging.toString)
    // marker rides INSIDE the staged dir, so it commits (or vanishes)
    // atomically with the slice's single rename
    markerFile.foreach { case (name, content) =>
      writeMarker(spark, s"$staging/$name", content)
    }
    if (fs.exists(target)) { fs.delete(staging, true); false } // replay race
    else if (!fs.rename(staging, target))
      throw new IllegalStateException(s"cannot commit slice $target")
    else true
  }

  /** Write a small UTF-8 marker file (checked create-overwrite). */
  def writeMarker(spark: SparkSession, path: String, content: String): Unit = {
    val fs = fileSystem(spark, path)
    val out = fs.create(new Path(path), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a marker file written by [[writeMarker]], if present. */
  def readMarker(spark: SparkSession, path: String): Option[String] = {
    val fs = fileSystem(spark, path)
    val p = new Path(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Highest batch id among the live slices — the generation a fold of
    * them would commit as; None when there is nothing to fold. */
  def foldTarget(dirs: Seq[String]): Option[Long] =
    dirs.flatMap(d => batchId(new Path(d).getName)).reduceOption(_ max _)

  /** The next free batch id under `root`: above every live slice's id
    * AND the newest base's folded-through generation. */
  def nextBatchId(spark: SparkSession, root: String): Long = {
    val ids = liveDirs(spark, root)
      .map(d => new Path(d).getName)
      .flatMap(n => baseGen(n).orElse(batchId(n)))
    (ids :+ -1L).max + 1
  }

  /** Marker inside a stream CHECKPOINT dir binding that stream's
    * slice-id base offset — written once when the checkpoint is created
    * (see [[sliceOffset]]). */
  val OffsetFile = "_graft.sliceOffset"

  /** The slice-id offset bound to `checkpoint` for slices under `root`:
    * structured streaming numbers every checkpoint's batches from 0, so
    * a FRESH checkpoint writing into a root that already has slices
    * would re-address slice `delta=b0` — [[writeSlice]] finds it present
    * and treats the genuinely NEW batch as a replay no-op (silent drop),
    * and after a fold the id can land ≤ the committed generation
    * (invisible to [[liveDirs]], swept by the next GC — silent loss; the
    * round-17 advisory, ingest flavor — the serve stream's output slices
    * have the identical failure). The offset claims [[nextBatchId]] —
    * above every live id AND the folded generation — when the checkpoint
    * is first created, and PERSISTS it inside the checkpoint so replays
    * of the same checkpoint keep the same slice addressing
    * (exactly-once needs the replayed batch to find its own slice). A
    * checkpoint that predates the marker (has Spark offsets but no
    * marker) resumes at offset 0 — its batches already committed
    * un-offset slices. */
  def sliceOffset(spark: SparkSession, checkpoint: String,
      root: String): Long = {
    val marker = s"$checkpoint/$OffsetFile"
    readMarker(spark, marker) match {
      case Some(s) => s.trim.toLong
      case None =>
        val fs = fileSystem(spark, checkpoint)
        val legacyResume = fs.exists(new Path(s"$checkpoint/offsets"))
        val off = if (legacyResume) 0L else nextBatchId(spark, root)
        writeMarker(spark, marker, off.toString)
        off
    }
  }

  /** Atomically commit `root/compact.staging` as `delta=base@<gen>`. */
  def commitFold(spark: SparkSession, root: String, gen: Long): Unit = {
    val fs = fileSystem(spark, root)
    if (!fs.rename(new Path(s"$root/$Staging"), new Path(s"$root/delta=base@$gen")))
      throw new IllegalStateException(
        s"delta compact: cannot commit $Staging as delta=base@$gen under $root")
  }

  /** Pre-commit half of [[guardedCommit]]: a slice that is live now but
    * absent from `snapshot` landed AFTER the fold read its input —
    * committing would either fold it un-read (silent loss once
    * [[gcStale]] sweeps it) or leave it orphaned behind the new base.
    * Abort instead: the staged generation is discarded, the live set —
    * including the concurrent slice — stays fully intact. */
  private[graft] def abortOnConcurrent(spark: SparkSession, root: String,
      snapshot: Seq[String], what: String, hint: String): Unit = {
    val concurrent = liveDirs(spark, root).filterNot(snapshot.contains)
    if (concurrent.nonEmpty) {
      // checked like every other FileSystem mutation here: a failed
      // delete leaves a stale compact.staging the next fold must clear,
      // and the abort message must not claim it was discarded
      val staging = new Path(s"$root/$Staging")
      val discarded = fileSystem(spark, root).delete(staging, true)
      throw new IllegalStateException(
        s"$what raced a concurrent writer under $root: slices " +
          s"${concurrent.map(d => new Path(d).getName).mkString(", ")} " +
          s"landed after the $what read its input — $what aborted (live " +
          s"set unchanged" +
          (if (discarded) "" else s"; WARNING: staged dir $staging could " +
            "not be removed and must be cleared before the next fold") +
          s"); $hint")
    }
  }

  /** Suffix QUARANTINE renames append to a raced slice — a name neither
    * [[baseGen]] nor [[batchId]] parses, so [[liveDirs]] never reads it
    * and [[gcStale]] never sweeps it. */
  val QuarantineSuffix = ".quarantined"

  /** The quarantined slice dirs under `root` (paths as strings, sorted)
    * — evidence [[refuseGcOnConcurrent]] preserved; surfaced by
    * StoreDoctor / the service CLI's status so an operator re-ingests
    * the raced batches and deletes the quarantine dirs. */
  def quarantined(spark: SparkSession, root: String): Seq[String] = {
    val rootPath = new Path(root)
    val fs = fileSystem(spark, root)
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.endsWith(QuarantineSuffix))
      .map(_.getPath.toString).toSeq.sorted
  }

  /** Post-commit half of [[guardedCommit]]: a slice the just-committed
    * generation CLAIMS (batch id ≤ gen) but the fold never read must not
    * be swept — deleting it is silent loss. QUARANTINE it (rename to a
    * name no liveness or GC rule parses — before round 18 the slice was
    * merely left in place, and the NEXT routine compact's [[gcStale]]
    * deleted it silently because its id was ≤ the committed generation:
    * the only copy of the un-folded rows survived exactly one cycle) and
    * fail loudly so the operator re-ingests its batch from the
    * quarantined evidence. */
  private[graft] def refuseGcOnConcurrent(spark: SparkSession, root: String,
      snapshot: Seq[String], gen: Long, what: String, hint: String): Unit = {
    val fs = fileSystem(spark, root)
    val folded = fs.listStatus(new Path(root))
      .filter(_.isDirectory).map(_.getPath.toString)
      .filter(d => batchId(new Path(d).getName).exists(_ <= gen))
      .filterNot(snapshot.contains)
    if (folded.nonEmpty) {
      val kept = folded.map { d =>
        val p = new Path(d)
        val q = new Path(p.getParent, p.getName + QuarantineSuffix)
        // best effort per slice, but NEVER silent: an unrenamable slice
        // is still reported in the thrown message (un-quarantined — the
        // next gcStale would sweep it, so the operator must act now)
        if (fs.exists(q) || fs.rename(p, q)) q.getName else p.getName + " (NOT renamed — will be GC'd by the next compact)"
      }
      throw new IllegalStateException(
        s"$what committed delta=base@$gen under $root but slices " +
          s"${folded.map(d => new Path(d).getName).mkString(", ")} landed " +
          s"concurrently and are NOT in the new base — quarantined as " +
          s"${kept.mkString(", ")} (never GC'd; re-ingest their rows, then " +
          s"delete the quarantine dirs); $hint")
    }
  }

  /** [[commitFold]] bracketed by the concurrent-writer guards the IVF
    * rebuild earned in round 16, shared by EVERY delta root since round
    * 17 (the index/edge roots relied on a single-writer contract note —
    * the same silent-loss class, now enforced): `snapshot` is the live
    * set the fold READ; any slice beyond it aborts the commit pre-rename
    * ([[abortOnConcurrent]]) or refuses the sweep post-rename
    * ([[refuseGcOnConcurrent]]) — every interleaving ends loud, none in
    * silent loss. */
  def guardedCommit(spark: SparkSession, root: String, snapshot: Seq[String],
      gen: Long, what: String, hint: String): Unit = {
    abortOnConcurrent(spark, root, snapshot, what, hint)
    commitFold(spark, root, gen)
    refuseGcOnConcurrent(spark, root, snapshot, gen, what, hint)
    gcStale(spark, root)
  }

  /** Fold an APPEND-ONLY output root (per-batch FACT slices — served
    * answers, diagnostic outputs) into the next base generation by
    * plain CONCATENATION, committed under the concurrent-writer guards:
    * rows are disjoint per batch, so the fold is a union with no
    * re-aggregation. At scale a long-running output stream otherwise
    * accumulates one directory per micro-batch forever — the data stays
    * correct, but every reader's slice listing grows without bound. */
  def compactConcat(spark: SparkSession, root: String): Unit =
    compactConcatFrom(spark, root, liveDirs(spark, root))

  /** [[compactConcat]] from an explicit snapshot — the race-spec seam. */
  private[graft] def compactConcatFrom(spark: SparkSession, root: String,
      dirs: Seq[String]): Unit =
    foldTarget(dirs) match {
      case Some(maxId) =>
        // checkpoint pins the union BEFORE the commit GCs its source
        // slices (the StreamEdges.compact convention)
        val all = spark.read.parquet(dirs: _*).localCheckpoint()
        all.write.mode("overwrite").parquet(s"$root/$Staging")
        guardedCommit(spark, root, dirs, maxId, "output compact",
          "re-run the raced batches (replay-idempotent), then compact again")
      case None => gcStale(spark, root)
    }

  /** Default live-batch-slice budget before [[compactPolicy]] calls for
    * a fold: at one slice per micro-batch a long-running stream grows
    * its root's listing without bound; 8 keeps every reader's slice
    * listing O(1) while folding rarely enough that the fold cost
    * amortizes over many batches. */
  val DefaultMaxSlices = 8L

  /** WHEN to fold — the [[graft.streaming.VectorService.rebuildPolicy]]
    * discipline applied to delta/output roots (rebuilds had a policy;
    * folds relied on a deployment remembering to call them): one
    * integer-exact decision from the root's OWN listing. `compact` fires
    * when the live batch-slice count exceeds `maxSlices`; `nQuarantined`
    * rides along so every status surface that consults the policy also
    * surfaces preserved race evidence ([[quarantined]]). Driver-side
    * cost: one directory listing — the same order as planning any read
    * of the root. */
  final case class CompactDecision(nBatchSlices: Long, maxSlices: Long,
      compact: Boolean, nQuarantined: Long)

  def compactPolicy(spark: SparkSession, root: String,
      maxSlices: Long = DefaultMaxSlices): CompactDecision = {
    val nBatch = liveDirs(spark, root)
      .count(d => batchId(new Path(d).getName).isDefined).toLong
    CompactDecision(nBatch, maxSlices, nBatch > maxSlices,
      quarantined(spark, root).size.toLong)
  }

  /** The policy CONSULTED, then acted on — [[compactPolicy]] decides,
    * `fold` runs only when it fires (a healthy root is never touched —
    * the maintainIfNeeded contract, fold flavor). Returns true when a
    * fold ran. `fold` is a parameter because roots fold differently:
    * output roots concatenate ([[compactConcat]]), index/edge roots
    * re-aggregate from their own artifacts. */
  def compactIfNeeded(spark: SparkSession, root: String,
      maxSlices: Long = DefaultMaxSlices)(fold: => Unit): Boolean = {
    val d = compactPolicy(spark, root, maxSlices)
    if (d.compact) { fold; true } else false
  }

  /** [[compactIfNeeded]] instantiated with the append-only concat fold —
    * the output-root maintenance entry point. */
  def compactConcatIfNeeded(spark: SparkSession, root: String,
      maxSlices: Long = DefaultMaxSlices): Boolean =
    compactIfNeeded(spark, root, maxSlices)(compactConcat(spark, root))

  /** Remove every base older than the newest generation and every batch
    * slice it folded — including garbage a crashed pass left. Failed
    * deletes throw rather than leaving state to drift silently. */
  def gcStale(spark: SparkSession, root: String): Unit = {
    val fs = fileSystem(spark, root)
    val rootPath = new Path(root)
    val newestGen = fs.listStatus(rootPath).filter(_.isDirectory)
      .flatMap(s => baseGen(s.getPath.getName)).reduceOption(_ max _)
    newestGen.foreach { gen =>
      fs.listStatus(rootPath).filter(_.isDirectory).foreach { s =>
        val n = s.getPath.getName
        val stale = baseGen(n).exists(_ < gen) || batchId(n).exists(_ <= gen)
        if (stale && !fs.delete(s.getPath, true))
          throw new IllegalStateException(
            s"delta compact: cannot remove folded slice ${s.getPath}")
      }
    }
  }
}
