package graft.util

/** Launch-path parity canary for JDK 17 module opens.
  *
  * spark-submit (and build.sbt's fork options) inject the full
  * `org.apache.spark.launcher.JavaModuleOptions` list of
  * `--add-opens` flags; a bare `java -cp` launch does not. Most of
  * the suite works anyway — until the first shuffle whose serializer
  * auto-resolves to Kryo (any RDD of primitive arrays, e.g. the
  * Bloom bitset treeAggregate in text_decontaminate_bloom), because
  * `KryoSerializer.newKryo` registers `HeapByteBuffer`, which
  * reflectively opens `java.nio`. That failure surfaced at sf10 hour
  * one instead of second one (BENCH_LOCAL.md r11). This canary forces
  * the same registration at startup so a launcher missing the opens
  * fails immediately with a named remedy.
  */
object LauncherCheck {
  /** Construct a Kryo instance (registers HeapByteBuffer et al.).
    * Throws IllegalStateException naming the missing JVM flags if the
    * launch path lacks the module opens Spark needs on JDK 9+.
    */
  def assertModuleOpens(): Unit =
    try {
      val conf = new org.apache.spark.SparkConf(false)
      new org.apache.spark.serializer.KryoSerializer(conf).newKryo()
    } catch {
      case e: Throwable =>
        throw new IllegalStateException(
          "Launcher parity check failed: KryoSerializer.newKryo could not " +
          "register JDK internals. This launch path is missing the " +
          "--add-opens flags spark-submit injects (notably " +
          "java.base/java.nio=ALL-UNNAMED and " +
          "java.base/jdk.internal.ref=ALL-UNNAMED). Launch via " +
          "tools/run.sh or sbt (both carry the full JavaModuleOptions " +
          "list) instead of bare java -cp. Underlying error: " +
          e.getMessage, e)
    }
}
