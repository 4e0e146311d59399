package graft

import graft.streaming.{KafkaTransport, NetBroker, NetPublisher,
  NetTransport, PublishTransport}
import org.scalatest.funsuite.AnyFunSuite

/** The [[graft.streaming.PublishTransport]] contract written ONCE and
  * instantiated per transport leg (round-11 verdict #6: "contract spec
  * parameterized over transports"), so the production Kafka swap is
  * held to exactly the semantics the routing sink already relies on:
  * ordered acked delivery with attributes, create-once idempotent topic
  * ensure, fail-fast credentials, executor-shippable serialization.
  *
  * The NetTransport leg runs against the in-process broker and must be
  * green. The Kafka leg needs a broker + the kafka-clients jar, neither
  * of which exists in this zero-egress sandbox — its contract tests are
  * CANCELED with the reason (visible, not silently skipped), and the
  * leg that CAN run here (the documented jar-absent fail-fast) always
  * does. */
abstract class PublishTransportContract extends AnyFunSuite {
  def legName: String
  /** Some(reason) when this leg cannot run in this environment. */
  def unavailableReason: Option[String]

  trait Harness {
    def transport(creds: Option[String] = None): PublishTransport
    def delivered(topic: String): Seq[(String, Map[String, String])]
    def createCount(topic: String): Long
    /** Drop the JVM-global create-once cache (test isolation). */
    def resetCache(): Unit
  }
  def withHarness(f: Harness => Unit): Unit

  private def ready(): Unit =
    unavailableReason.foreach(r => assume(false, r))

  test(s"$legName transport: delivers rows + attributes in order, acked before return") {
    ready()
    withHarness { h =>
      h.resetCache()
      val t = h.transport()
      t.ensureTopic("t_contract")
      t.publishPartition(Iterator(
        ("t_contract", "m1", Map("k" -> "v1")),
        ("t_contract", "m2", Map.empty[String, String]),
        ("t_contract", "m3", Map("k" -> "v3", "x" -> "y"))))
      // publishPartition RETURNED => every frame is already acked, so
      // the broker must hold all three, in order, attrs intact
      assert(h.delivered("t_contract") == Seq(
        ("m1", Map("k" -> "v1")),
        ("m2", Map.empty[String, String]),
        ("m3", Map("k" -> "v3", "x" -> "y"))))
    }
  }

  test(s"$legName transport: ensureTopic is create-once idempotent") {
    ready()
    withHarness { h =>
      h.resetCache()
      val t = h.transport()
      t.ensureTopic("t_once"); t.ensureTopic("t_once"); t.ensureTopic("t_once")
      assert(h.createCount("t_once") == 1,
        "repeated ensureTopic leaked CREATE calls past the process cache")
    }
  }

  test(s"$legName transport: unusable credentials abort construction (R15 fail-fast)") {
    ready()
    withHarness { h =>
      intercept[IllegalArgumentException] {
        h.transport(Some("/missing/creds.json"))
      }
      val empty = java.io.File.createTempFile("creds-empty", ".properties")
      empty.deleteOnExit()
      intercept[IllegalArgumentException] { h.transport(Some(empty.getPath)) }
    }
  }

  test(s"$legName transport: serializes and publishes after the round trip (executor-shippable)") {
    ready()
    withHarness { h =>
      h.resetCache()
      val t = h.transport()
      val bytes = {
        val bos = new java.io.ByteArrayOutputStream()
        val oos = new java.io.ObjectOutputStream(bos)
        oos.writeObject(t); oos.close()
        bos.toByteArray
      }
      val t2 = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes))
        .readObject().asInstanceOf[PublishTransport]
      t2.ensureTopic("t_ser")
      t2.publishPartition(
        Iterator(("t_ser", "after-roundtrip", Map.empty[String, String])))
      assert(h.delivered("t_ser") ==
        Seq(("after-roundtrip", Map.empty[String, String])))
    }
  }
}

class NetTransportContractSpec extends PublishTransportContract {
  override def legName = "net"
  override def unavailableReason: Option[String] = None
  override def withHarness(f: Harness => Unit): Unit = {
    val broker = new NetBroker()
    try f(new Harness {
      override def transport(creds: Option[String]): PublishTransport =
        NetTransport(broker.addr, creds)
      override def delivered(topic: String) =
        broker.messages(topic).map(m => (m.data, m.attrs))
      override def createCount(topic: String): Long =
        broker.createCount(topic)
      override def resetCache(): Unit = NetPublisher.reset()
    })
    finally broker.close()
  }
}

class KafkaTransportContractSpec extends PublishTransportContract {
  override def legName = "kafka"
  override def unavailableReason: Option[String] =
    if (KafkaTransport.clientPresent) None
    else Some("kafka-clients jar absent (zero-egress sandbox) — the " +
      "Kafka leg binds reflectively and is contract-tested wherever " +
      "the jar and a broker exist")
  override def withHarness(f: Harness => Unit): Unit = {
    // With the jar present a harness would point bootstrapServers at a
    // test broker; in this sandbox unavailableReason cancels first.
    f(new Harness {
      override def transport(creds: Option[String]): PublishTransport =
        KafkaTransport("localhost:9092", creds)
      override def delivered(topic: String) =
        fail("no Kafka broker in this environment")
      override def createCount(topic: String): Long =
        fail("no Kafka broker in this environment")
      override def resetCache(): Unit = KafkaTransport.reset()
    })
  }

  test("kafka transport: jar-absent construction fails fast naming the dependency") {
    // the one Kafka-leg behavior that IS testable here, and the one a
    // misconfigured production rollout hits first: constructing the
    // transport without kafka-clients must abort with the coordinates,
    // at pipeline construction — never at micro-batch N
    assume(!KafkaTransport.clientPresent,
      "kafka-clients present — fail-fast path untestable")
    val e = intercept[IllegalStateException] { KafkaTransport("b:9092") }
    assert(e.getMessage.contains("org.apache.kafka:kafka-clients"))
  }

  test("kafka transport: session wiring selects the Kafka leg from spark.graft.kafkaBootstrap") {
    import TestSpark._
    spark.conf.set("spark.graft.kafkaBootstrap", "b:9092")
    try {
      if (KafkaTransport.clientPresent) {
        val t = graft.streaming.Transports.fromSession(spark, "ignored")
        assert(t.isInstanceOf[KafkaTransport])
      } else {
        // jar absent: selection still routes to the Kafka leg, whose
        // constructor fail-fast fires at pipeline construction
        val e = intercept[IllegalStateException] {
          graft.streaming.Transports.fromSession(spark, "ignored")
        }
        assert(e.getMessage.contains("kafka-clients"))
      }
    } finally spark.conf.unset("spark.graft.kafkaBootstrap")
  }
}
