package graft.streaming

import java.nio.file.{Files, Path}
import scala.util.matching.Regex

/** Shared listing of version-numbered directory entries —
  * `ParquetStateStore`'s `v<N>` state dirs and `FileIngest`'s
  * `v<N>.json` schema trail both follow the pattern. One
  * implementation so the fd-handling (a `Files.list` stream leaks a
  * descriptor unless closed) and the numeric sort live in one place.
  */
private[streaming] object VersionedDir {

  /** Entries of `dir` whose file name matches `pattern` (exactly one
    * numeric capture group), ascending by that number. Empty for a
    * missing dir.
    */
  def list(dir: Path, pattern: Regex): Seq[(Long, Path)] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val listing = Files.list(dir)
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Path)]
        listing.iterator().forEachRemaining { p =>
          p.getFileName.toString match {
            case pattern(v) => buf += (v.toLong -> p)
            case _ => ()
          }
        }
        buf.sortBy(_._1).toSeq
      } finally listing.close()
    }
}
