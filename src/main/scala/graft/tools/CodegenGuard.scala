package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Trip-wire for SILENT codegen fallbacks during bench/probe runs.
  *
  * When Janino rejects generated code, Spark logs an ERROR from
  * `CodeGenerator` ("failed to compile: ...") and silently falls back
  * to interpreted execution — the run stays green while every plan
  * that touches the expression loses whole-stage codegen. Round 11's
  * static-forwarder bug did exactly this: 43 such lines in the bench
  * log, every LSH plan interpreted, caught only by a 100x scale
  * probe. This guard attaches an in-process log4j2 appender to the
  * root logger and counts ERROR events from codegen (logger name
  * containing `CodeGenerator`, or a message containing "failed to
  * compile"), so the bench itself fails loudly at sf0.1 the next
  * time a fallback appears.
  *
  * Local-mode only by design: executors share the driver JVM and its
  * log4j context, so every fallback in a bench run is visible here.
  */
object CodegenGuard {

  private val count = new AtomicInteger(0)
  private val samples = new ConcurrentLinkedQueue[String]
  private val MaxSamples = 5
  @volatile private var installed = false

  private final class Guard
      extends AbstractAppender("graft-codegen-guard", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = {
      if (event.getLevel.isMoreSpecificThan(Level.ERROR)) {
        val logger = Option(event.getLoggerName).getOrElse("")
        val msg = Option(event.getMessage)
          .map(_.getFormattedMessage).getOrElse("")
        // the message heuristic is SCOPED to codegen-adjacent loggers
        // (catalyst/execution) so an unrelated component logging the
        // phrase "failed to compile" can't hard-fail a bench run;
        // the CodeGenerator logger-name match needs no message at all
        val codegenAdjacent =
          logger.startsWith("org.apache.spark.sql.catalyst") ||
          logger.startsWith("org.apache.spark.sql.execution")
        if (logger.contains("CodeGenerator") ||
            (codegenAdjacent && msg.toLowerCase.contains("failed to compile"))) {
          count.incrementAndGet()
          if (samples.size < MaxSamples)
            samples.add(s"$logger: ${msg.take(300)}")
        }
      }
    }
  }

  /** Attach the appender (idempotent). Call AFTER SparkSession
    * creation so Spark's log4j context is the one configured;
    * `setLogLevel` only moves the root level (ERROR still passes)
    * and leaves appenders in place. */
  def install(): Unit = synchronized {
    if (!installed) {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val appender = new Guard
      appender.start()
      ctx.getConfiguration.getRootLogger.addAppender(appender, Level.ERROR, null)
      ctx.updateLoggers()
      installed = true
    }
  }

  def errorCount: Int = count.get()

  /** Dump captured samples to stderr; returns the error count. */
  def report(): Int = {
    val n = count.get()
    if (n > 0) {
      System.err.println(s"[codegen-guard] $n codegen fallback error(s):")
      samples.forEach(s => System.err.println(s"[codegen-guard]   $s"))
    }
    n
  }
}
