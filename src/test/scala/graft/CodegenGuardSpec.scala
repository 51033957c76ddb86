package graft

import graft.tools.CodegenGuard

/** The guard must see ERROR events from Spark's codegen logger
  * through whatever log4j2 configuration the session left behind —
  * this is the wiring the bench's fail-on-fallback assertion depends
  * on, so it is pinned with synthetic events through the REAL logger
  * (a genuine Janino failure is deliberately hard to construct from
  * supported expressions).
  */
class CodegenGuardSpec extends SparkSpec {

  test("guard counts CodeGenerator ERROR events, ignores WARN and others") {
    CodegenGuard.install()
    val before = CodegenGuard.errorCount
    val cg = org.apache.logging.log4j.LogManager.getLogger(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
    cg.error("failed to compile: synthetic guard-spec event")
    cg.warn("failed to compile: WARN must not count")
    org.apache.logging.log4j.LogManager.getLogger("graft.unrelated")
      .error("some unrelated error")
    assert(CodegenGuard.errorCount == before + 1)
    // message-based match catches fallbacks logged under other
    // catalyst/execution names...
    org.apache.logging.log4j.LogManager.getLogger(
        "org.apache.spark.sql.execution.WholeStageCodegenExec")
      .error("Failed to compile the generated class")
    assert(CodegenGuard.errorCount == before + 2)
    // ...but is SCOPED to codegen-adjacent loggers: an unrelated
    // component using the phrase must not hard-fail a bench run
    org.apache.logging.log4j.LogManager.getLogger("graft.unrelated")
      .error("Failed to compile the generated class")
    assert(CodegenGuard.errorCount == before + 2)
  }
}
