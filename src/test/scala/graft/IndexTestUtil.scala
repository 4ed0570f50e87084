package graft

/** Shared spec probes for index content and physical layout (used by
  * CompactSpec, MaintainSpec): the full decoded postings content keyed by
  * term, and a recursive (relative path → size) file listing for
  * byte-identity assertions. */
object IndexTestUtil {

  def decodedContent(h: graft.query.IndexHandle): Map[String, Seq[(Long, Int, Seq[Int])]] = {
    val terms = h.dictionary.collect().map(e => e.termId -> e.term).toMap
    h.postings.collect()
      .flatMap { b =>
        val ids = graft.codec.VByte.decodeDocIds(b.docIdGaps)
        val tfs = graft.codec.VByte.decodeInts(b.tfs)
        val poss = graft.codec.VByte.decodePositions(b.positions, tfs)
        ids.indices.map(j => (terms(b.termId), ids(j), tfs(j), poss(j).toSeq))
      }
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq }
  }

  def fileSizes(root: String): Map[String, Long] = {
    val base = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(base)) Map.empty
    else {
      val out = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.walk(base).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p))
          out(base.relativize(p).toString) = java.nio.file.Files.size(p)
      }
      out.toMap
    }
  }
}
