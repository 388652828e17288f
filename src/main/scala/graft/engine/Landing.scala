package graft.engine

import org.apache.spark.sql.DataFrame

/** Delta-file landing for materialized tier directories — the write
  * side of the incremental appends (`Dedup.appendToCascade`,
  * `Dedup.appendToSemanticCc`, `Similarity.appendToPqIndex`).
  *
  * The r17 appends were compute-incremental but I/O-total: each tier
  * landed as `read(old).unionByName(delta).write(new)`, a full read
  * AND rewrite of the corpus-sized resident history per batch — at
  * 100 TB a daily append paid a full-corpus copy. Here the resident
  * data never moves through Spark at all:
  *
  *  - [[landDelta]] (two-address form, snapshot semantics): the new
  *    tier directory is assembled from the OLD tier's data files
  *    entered by HARD LINK — an O(#files) metadata operation, zero
  *    data bytes — plus the delta frame's freshly written part files,
  *    with `_SUCCESS` created LAST so the `ContentAddress.hasSuccess`
  *    commit gate keeps its crash-resume semantics (a death mid-
  *    assembly leaves no marker and the tier reassembles; links are
  *    idempotent to rebuild because the partial dir is dropped first).
  *    The old directory's files stay byte-identical — a link shares
  *    the inode and never touches source mtime — so the frozen
  *    yesterday-snapshot stays exactly as addressed, and pruning a
  *    superseded revision later only unlinks (the shared inodes
  *    survive in whichever address still references them).
  *  - [[landInto]] (single-address form, the `appendToIvfIndex`
  *    pattern): the delta's part files are staged outside the live
  *    directory and moved in by per-file atomic rename — resident
  *    files untouched, readers mid-append see whole files only.
  *
  * Like `appendToIvfIndex`, this is deliberately local-FS (java.io /
  * java.nio): the staged-rename and hard-link moves are posix
  * semantics. On a distributed FS the same contract is a manifest
  * commit (Delta/Iceberg-style "add files" transaction) — the LAYOUT
  * this helper produces (immutable base files + per-batch delta
  * files under one readable directory) is exactly what those layers
  * commit, so the operator semantics carry over unchanged.
  */
object Landing {

  private def dataFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  /** Enter `src` into `destDir` by hard link; fall back to a byte copy
    * only where the filesystem refuses links (cross-device, or an FS
    * without link support) — correctness is identical, only the
    * zero-copy property degrades, and the parquet part names are
    * writer-UUID-unique so a collision means a torn previous assembly
    * (dropped by the caller before reassembly, so we can only race
    * ourselves).
    */
  private def linkOrCopy(src: java.io.File, destDir: java.io.File): Unit = {
    val dest = new java.io.File(destDir, src.getName)
    try java.nio.file.Files.createLink(dest.toPath, src.toPath)
    catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        java.nio.file.Files.copy(src.toPath, dest.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Assemble `newTierDir` = link(resident data files of `oldTierDir`)
    * + `delta`'s part files, committing `_SUCCESS` last. Any partial
    * previous assembly (dir present, no `_SUCCESS`) is dropped first —
    * the same overwrite semantics the Spark writer gave the old
    * union-rewrite path.
    */
  def landDelta(delta: DataFrame, oldTierDir: String, newTierDir: String): Unit = {
    val dest = new java.io.File(newTierDir)
    if (dest.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dest)
    val staging = newTierDir + ".delta-" + java.util.UUID.randomUUID().toString
    val stagingDir = new java.io.File(staging)
    try {
      delta.write.mode("overwrite").parquet(staging)
      require(dest.mkdirs(), s"landDelta: cannot create $newTierDir")
      dataFiles(new java.io.File(oldTierDir)).foreach(linkOrCopy(_, dest))
      dataFiles(stagingDir).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new java.io.File(dest, f.getName).toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      require(new java.io.File(dest, "_SUCCESS").createNewFile(),
        s"landDelta: cannot commit $newTierDir")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(stagingDir)
  }

  /** Assemble `newTierDir` as a pure LINK of `oldTierDir`'s data files
    * (no delta) — the frozen-tier form for append targets whose tier
    * is byte-identical to the old snapshot's (e.g. the PQ codebooks,
    * which an append never retrains). Same commit protocol as
    * [[landDelta]]: partial assembly dropped, `_SUCCESS` last.
    */
  def linkTier(oldTierDir: String, newTierDir: String): Unit = {
    val dest = new java.io.File(newTierDir)
    if (dest.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dest)
    require(dest.mkdirs(), s"linkTier: cannot create $newTierDir")
    dataFiles(new java.io.File(oldTierDir)).foreach(linkOrCopy(_, dest))
    require(new java.io.File(dest, "_SUCCESS").createNewFile(),
      s"linkTier: cannot commit $newTierDir")
  }

  /** Stage `delta` and move its part files into the LIVE committed
    * tier directory by atomic rename — the single-address ingest form.
    * Returns the number of data files landed (0 = an empty delta still
    * lands its schema-only part file; callers that want a true no-op
    * on an empty batch should check emptiness before calling).
    */
  def landInto(delta: DataFrame, tierDir: String): Int = {
    require(new java.io.File(tierDir, "_SUCCESS").exists(),
      s"landInto requires a committed tier at $tierDir")
    val staging = tierDir + ".delta-" + java.util.UUID.randomUUID().toString
    val stagingDir = new java.io.File(staging)
    try {
      delta.write.mode("overwrite").parquet(staging)
      val files = dataFiles(stagingDir)
      files.foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new java.io.File(tierDir, f.getName).toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
      files.size
    } finally org.apache.commons.io.FileUtils.deleteQuietly(stagingDir)
  }
}
