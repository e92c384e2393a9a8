package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Self-cleaning scratch directories: every dir is registered for
  * recursive deletion at JVM exit, so repeated Verify/Bench runs don't
  * accumulate table copies and streaming checkpoints in /tmp
  * (code-review r3; one shared implementation instead of per-caller
  * shutdown hooks).
  */
object Scratch {

  /** Create a temp directory deleted recursively on JVM exit. */
  def dir(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        Files.walk(d).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Exception => () }))
    d.toString
  }
}
