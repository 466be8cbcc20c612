package graft

import graft.core.Sessions
import org.scalatest.funsuite.AnyFunSuite

/** Pins the environment-dependent pieces of session tuning that a live
  * SparkSession can't exercise both ways in one JVM.
  *
  * The heartbeat contract (ADVICE r17): the widened heartbeat /
  * network-timeout / failure-budget trio exists to survive driver RPC
  * starvation in the single-JVM local[n] mode, where executor and driver
  * share fate. Under SPARK_GRAFT_MASTER (the local-cluster stand-in or a
  * real cluster) those same values would let a hung executor evade
  * self-exit for ~8h and widen lost-executor detection 120s→600s — so
  * there the settings must NOT be emitted at all unless the env asks.
  */
class SessionsSpec extends AnyFunSuite {

  private val widened = Map(
    "spark.executor.heartbeatInterval" -> "30s",
    "spark.network.timeout" -> "600s",
    "spark.executor.heartbeat.maxFailures" -> "1000")

  test("local[n] (no master override) widens all three heartbeat dials") {
    assert(Sessions.heartbeatSettings(Map.empty).toMap === widened)
  }

  test("SPARK_GRAFT_MASTER leaves Spark heartbeat defaults untouched") {
    val out = Sessions.heartbeatSettings(
      Map("SPARK_GRAFT_MASTER" -> "local-cluster[2,8,4096]"))
    assert(out.isEmpty)
  }

  test("explicit env overrides win in cluster mode, others stay default") {
    val out = Sessions.heartbeatSettings(Map(
      "SPARK_GRAFT_MASTER" -> "spark://host:7077",
      "SPARK_GRAFT_NETWORK_TIMEOUT" -> "240s")).toMap
    assert(out === Map("spark.network.timeout" -> "240s"))
  }

  test("explicit env overrides also win over the local widened values") {
    val out = Sessions.heartbeatSettings(
      Map("SPARK_GRAFT_HEARTBEAT_MAX_FAILURES" -> "60")).toMap
    assert(out("spark.executor.heartbeat.maxFailures") === "60")
    assert(out("spark.executor.heartbeatInterval") === "30s")
  }
}
