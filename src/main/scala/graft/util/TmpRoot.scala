package graft.util

/** Per-JVM scratch root (`…/graft-<name>-<pid>`), removed on JVM exit —
  * gate queries that materialize on-disk artifacts (the entries
  * warehouse, the FTS indexes) write under one of these so concurrent
  * JVMs (sbt test alongside Verify) can never overwrite parquet files
  * another JVM's in-flight scan already listed, and repeated runs don't
  * accumulate in tmp. Same discipline as entries.Warehouse.FixturePath.
  */
object TmpRoot {
  def apply(name: String): String = {
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft-$name-${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(root)
    }))
    root.getAbsolutePath
  }
}
