package graft.queries

/** Shared epoch-generation store for the streaming index lifecycles
  * (s27 LSH, s28 ANN): epoch=N delta directories folded periodically
  * into a single watermark-keyed compact=N generation.
  *
  * CRASH SAFETY (r15 review finding): a compacted generation spans
  * MULTIPLE leaf directories (bands+sets / bands+vecs) written by
  * separate non-atomic parquet jobs — so a compact=N directory is
  * visible only once its `_GRAFT_COMMITTED` marker exists, and the
  * marker is created strictly AFTER every leaf has landed. A crash
  * mid-fold leaves an uncommitted partial dir that [[latestCompact]]
  * ignores; the replayed trigger still sees the not-yet-deleted
  * inputs (they are dropped only after the marker), rewrites every
  * leaf with overwrite, and commits. A crash after the marker but
  * before the input deletes leaves folded dirs behind — harmless,
  * because serving and the next fold select by the committed
  * watermark, never by directory existence.
  */
private[queries] object EpochStore {

  private val Marker = "_GRAFT_COMMITTED"

  private def fs(s: org.apache.spark.sql.SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The newest COMMITTED compacted generation: (upToEpoch, path). */
  def latestCompact(s: org.apache.spark.sql.SparkSession,
      dir: String): Option[(Long, String)] = {
    val f = fs(s, dir)
    val d = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(d)) return None
    f.listStatus(d).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("compact=") &&
        f.exists(new org.apache.hadoop.fs.Path(st.getPath, Marker)))
      .map(st => (st.getPath.getName.stripPrefix("compact=").toLong,
        st.getPath.toString))
      .sortBy(-_._1).headOption
  }

  /** Live (not yet folded) epoch generations under `dir`. */
  def epochGens(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Long, String)] = {
    val f = fs(s, dir)
    val d = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(d)) return Seq.empty
    f.listStatus(d).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("epoch="))
      .map(st => (st.getPath.getName.stripPrefix("epoch=").toLong,
        st.getPath.toString))
      .sortBy(_._1)
  }

  /** Fold every epoch generation in (committedWatermark, upTo] plus
    * the prior committed generation into compact=upTo (all `leaves`,
    * then the marker), then delete the folded inputs. Replay-safe AND
    * crash-safe — see the object doc. */
  def compact(s: org.apache.spark.sql.SparkSession, dir: String,
      upTo: Long, leaves: Seq[String]): Unit = {
    val f = fs(s, dir)
    val prior = latestCompact(s, dir)
    val lo = prior.map(_._1).getOrElse(-1L)
    if (lo >= upTo) return // a COMMITTED compaction already covers upTo
    val folds = epochGens(s, dir).filter { case (id, _) => id > lo && id <= upTo }
    if (folds.isEmpty) return
    val tgt = s"$dir/compact=$upTo"
    leaves.foreach { leaf =>
      val srcs = prior.map(_._2 + "/" + leaf).toSeq ++ folds.map(_._2 + "/" + leaf)
      s.read.parquet(srcs: _*).coalesce(8)
        .write.mode("overwrite").parquet(s"$tgt/$leaf")
    }
    // all leaves landed — commit, THEN drop the folded inputs
    f.create(new org.apache.hadoop.fs.Path(tgt, Marker)).close()
    folds.foreach { case (_, p) =>
      f.delete(new org.apache.hadoop.fs.Path(p), true) }
    prior.foreach { case (_, p) =>
      f.delete(new org.apache.hadoop.fs.Path(p), true) }
  }

  /** Per-leaf read paths for serving: the committed compacted
    * generation plus every epoch above its watermark. */
  def servePaths(s: org.apache.spark.sql.SparkSession, dir: String,
      leaf: String): Seq[String] = {
    val prior = latestCompact(s, dir)
    val lo = prior.map(_._1).getOrElse(-1L)
    prior.map(_._2 + "/" + leaf).toSeq ++
      epochGens(s, dir).filter(_._1 > lo).map(_._2 + "/" + leaf)
  }

  /** Live generation count (committed compact + unfolded epochs) —
    * the bounded-small-files spec's measurement. */
  def liveGenerations(s: org.apache.spark.sql.SparkSession,
      dir: String): Int =
    latestCompact(s, dir).size +
      epochGens(s, dir).count(_._1 > latestCompact(s, dir).map(_._1).getOrElse(-1L))
}
