package graft.engine

import org.apache.spark.sql.SparkSession

/**
 * T10 — graceful shutdown: the reference traps SIGINT/SIGTERM and exits
 * (`/root/reference/main.go:69-79`). The Spark analog has real work to do
 * on the way out: stop active streaming queries (so their checkpoints
 * commit cleanly and the next start resumes exactly) before stopping the
 * session.
 */
object Shutdown {

  /** Install a JVM shutdown hook (fires on SIGINT/SIGTERM and normal
    * exit). Returns the hook thread so callers can `.remove()` it. */
  def install(spark: SparkSession): sys.ShutdownHookThread =
    sys.addShutdownHook(shutdown(spark))

  /** Stop streams, then (optionally) the session. Exception-safe: a
    * failing stream stop never blocks the remaining stops. */
  private[graft] def shutdown(spark: SparkSession, stopSession: Boolean = true): Unit = {
    spark.streams.active.foreach { q =>
      try q.stop()
      catch { case e: Throwable => System.err.println(s"[shutdown] ${q.name}: ${e.getMessage}") }
    }
    if (stopSession) {
      try spark.stop()
      catch { case e: Throwable => System.err.println(s"[shutdown] session: ${e.getMessage}") }
    }
  }
}
