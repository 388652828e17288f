package graft

/** Shared tier-file evidence helper for the landing/append/compaction
  * laws (review r18: three specs carried near-identical private
  * copies): a (name, size, md5) snapshot of a tier directory's DATA
  * files — the resident-untouched / hard-link proofs all compare
  * these. StreamingSpec's replay check deliberately snapshots
  * (name, size, mtime) instead — it proves no write happened at all,
  * a property an identical-bytes rewrite would slip past md5.
  */
object TierFiles {
  def snapshot(dir: String): Set[(String, Long, String)] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map { f =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
        (f.getName, f.length(), md5)
      }.toSet
}
