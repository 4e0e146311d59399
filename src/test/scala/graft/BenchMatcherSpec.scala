package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the concurrent-bench /proc cmdline matcher (round-14 advice +
  * verdict #7). The rule: launcher executable AND bench target token —
  * so observers that merely MENTION graft.Bench (pgrep/grep/tail/editor)
  * never stamp a clean run contaminated, while real sbt/java launchers
  * (including graft.BenchStreaming — a deliberate match, it contaminates
  * batch timings identically) are counted. Cmdlines are NUL-separated
  * exactly as /proc/<pid>/cmdline delivers them. */
class BenchMatcherSpec extends AnyFunSuite {
  private val NUL = "\u0000"
  private def cmd(argv: String*): String = argv.mkString("", NUL, NUL)

  test("sbt shell launcher with quoted runMain matches") {
    assert(Bench.isBenchLauncherCmdline(
      cmd("bash", "/usr/local/bin/sbt", "-batch", "runMain graft.Bench")))
  }

  test("direct sbt executable matches") {
    assert(Bench.isBenchLauncherCmdline(
      cmd("/usr/local/bin/sbt", "-batch", "runMain graft.Bench")))
  }

  test("forked java launcher with explicit class argv matches") {
    assert(Bench.isBenchLauncherCmdline(
      cmd("/opt/java/bin/java", "-cp", "a.jar:b.jar", "graft.Bench")))
  }

  test("java sbt-boot launcher carrying the runMain arg matches") {
    assert(Bench.isBenchLauncherCmdline(
      cmd("/usr/lib/jvm/java-17/bin/java", "-Xmx8g", "-jar",
        "/root/.sbt/sbt-launch.jar", "-batch", "runMain graft.Bench")))
  }

  test("BenchStreaming launcher matches deliberately (verdict #7 pin)") {
    assert(Bench.isBenchLauncherCmdline(
      cmd("bash", "/usr/local/bin/sbt", "runMain graft.BenchStreaming")))
  }

  test("pgrep -f graft.Bench does NOT match") {
    assert(!Bench.isBenchLauncherCmdline(
      cmd("pgrep", "-af", "graft.Bench")))
    assert(!Bench.isBenchLauncherCmdline(
      cmd("pgrep", "-f", "runMain graft.Bench")))
  }

  test("grep over sources or logs does NOT match") {
    assert(!Bench.isBenchLauncherCmdline(
      cmd("grep", "-rn", "runMain graft.Bench", "/tmp/sbt.log")))
  }

  test("tail on a bench log does NOT match") {
    assert(!Bench.isBenchLauncherCmdline(
      cmd("tail", "-f", "/tmp/bench_graft.Bench.log")))
  }

  test("editor on Bench.scala does NOT match") {
    assert(!Bench.isBenchLauncherCmdline(
      cmd("vim", "src/main/scala/graft/Bench.scala")))
  }

  test("bash -c one-liner merely echoing the string does NOT match") {
    assert(!Bench.isBenchLauncherCmdline(
      cmd("bash", "-c", "echo runMain graft.Bench")))
  }

  test("sbt launcher WITHOUT a bench target does NOT match") {
    assert(!Bench.isBenchLauncherCmdline(
      cmd("bash", "/usr/local/bin/sbt", "-batch", "test")))
    assert(!Bench.isBenchLauncherCmdline(
      cmd("/opt/java/bin/java", "-cp", "a.jar", "graft.Verify")))
  }

  test("empty and garbage cmdlines do NOT match") {
    assert(!Bench.isBenchLauncherCmdline(""))
    assert(!Bench.isBenchLauncherCmdline(NUL))
  }

  // ── Token-boundary rule (round-15 advice) ───────────────────────────
  // graft.Bench* classes beyond the two mains must never count: a test
  // JVM running BenchMatcherSpec itself, or a future BenchmarkUtil,
  // would otherwise stamp every quiet gate run contaminated.

  test("sbt test runner naming graft.BenchMatcherSpec does NOT match") {
    assert(!Bench.isBenchLauncherCmdline(
      cmd("bash", "/usr/local/bin/sbt", "-batch",
        "runMain graft.BenchMatcherSpec")))
    assert(!Bench.isBenchLauncherCmdline(
      cmd("bash", "/usr/local/bin/sbt", "-batch",
        "testOnly graft.BenchMatcherSpec")))
  }

  test("java launcher of a graft.Bench-prefixed class does NOT match") {
    assert(!Bench.isBenchLauncherCmdline(
      cmd("/opt/java/bin/java", "-cp", "a.jar", "graft.BenchmarkUtil")))
    assert(!Bench.isBenchLauncherCmdline(
      cmd("/opt/java/bin/java", "-cp", "a.jar", "graft.BenchMatcherSpec")))
  }

  test("runMain with trailing args after the main still matches") {
    assert(Bench.isBenchLauncherCmdline(
      cmd("bash", "/usr/local/bin/sbt", "runMain graft.Bench extraArg")))
    assert(Bench.isBenchLauncherCmdline(
      cmd("/usr/local/bin/sbt", "runMain graft.BenchStreaming --flag")))
  }

  test("fork rule: argsfile naming only graft.BenchMatcherSpec does NOT match") {
    assert(!Bench.isBenchForkCmdline(
      cmd("java", "@/tmp/sbt-args9.tmp"),
      _ => Some("-cp a.jar org.scalatest.Runner graft.BenchMatcherSpec")))
  }

  test("fork rule: argsfile naming graft.BenchStreaming matches") {
    assert(Bench.isBenchForkCmdline(
      cmd("java", "@/tmp/sbt-args9.tmp"),
      _ => Some("-cp a.jar xsbt.boot.Boot graft.BenchStreaming")))
  }

  // ── Orphaned forked-JVM rule (round-15 review finding) ─────────────

  private val benchArgs = Some("-cp a.jar:b.jar xsbt.boot.Boot " +
    "graft.Bench")
  private val otherArgs = Some("-cp a.jar:b.jar graft.Verify")

  test("orphaned fork: java @argsfile mentioning graft.Bench matches") {
    assert(Bench.isBenchForkCmdline(
      cmd("/usr/lib/jvm/java-17/bin/java", "@/tmp/sbt-args123.tmp"),
      { p => assert(p == "/tmp/sbt-args123.tmp"); benchArgs }))
  }

  test("fork rule: argsfile for a DIFFERENT main does NOT match") {
    assert(!Bench.isBenchForkCmdline(
      cmd("java", "@/tmp/sbt-args1.tmp"), _ => otherArgs))
  }

  test("fork rule: deleted argsfile is undetectable (no match, no crash)") {
    assert(!Bench.isBenchForkCmdline(
      cmd("java", "@/tmp/gone.tmp"), _ => None))
  }

  test("fork rule: non-java exe with an @token does NOT match") {
    assert(!Bench.isBenchForkCmdline(
      cmd("cat", "@/tmp/sbt-args123.tmp"), _ => benchArgs))
  }

  test("fork rule: java without any @argsfile does NOT match") {
    assert(!Bench.isBenchForkCmdline(
      cmd("java", "-cp", "a.jar", "SomeMain"), _ => benchArgs))
  }

  test("isBenchProcess reads a real argsfile on disk") {
    val f = java.nio.file.Files.createTempFile("sbt-args", ".tmp")
    try {
      java.nio.file.Files.writeString(f, benchArgs.get)
      assert(Bench.isBenchProcess(cmd("java", s"@$f")))
      java.nio.file.Files.writeString(f, otherArgs.get)
      assert(!Bench.isBenchProcess(cmd("java", s"@$f")))
    } finally java.nio.file.Files.delete(f)
  }
}
