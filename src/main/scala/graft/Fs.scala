package graft

/** Tiny filesystem helpers shared by the sink/test-harness paths —
  * previously three verbatim copies of the recursive delete walker
  * (EventsStream.swapIntoPlace, StreamingGate.freshDir,
  * ObjectSink.deleteRec); a future fix (symlink guard, retry) must land
  * once, not thrice. */
object Fs {
  def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }
}
