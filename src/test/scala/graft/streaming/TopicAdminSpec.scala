package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** [[TopicAdmin.ensureTopic]] contract: idempotent creation, graceful
  * degradation on admin failure, and no leaked admin clients — the
  * semantics a restarted producer depends on.
  */
class TopicAdminSpec extends AnyFunSuite {

  /** In-memory broker state shared across fake admin instances. */
  private final class FakeBroker {
    val topics = scala.collection.mutable.Map.empty[String, (Int, Short)]
    var failWith: Option[Throwable] = None

    def admin(): RecordingAdmin = new RecordingAdmin(this)
  }

  private class RecordingAdmin(broker: FakeBroker) extends TopicAdmin {
    var closed = false
    var createCalls = 0

    override def createTopic(topic: String, partitions: Int,
        replication: Short): Unit = {
      createCalls += 1
      broker.failWith.foreach(throw _)
      if (broker.topics.contains(topic))
        throw TopicAdmin.TopicExists(topic)
      broker.topics.put(topic, (partitions, replication))
    }
    override def close(): Unit = closed = true
  }

  test("absent topic is created with the requested layout") {
    val broker = new FakeBroker
    val admin = broker.admin()
    val out = TopicAdmin.ensureTopic(admin, "absa-reviews")
    assert(out === TopicAdmin.Created)
    assert(broker.topics("absa-reviews") === ((1, 1.toShort)))
    assert(admin.closed)
  }

  test("second call is idempotent: AlreadyExists, state untouched") {
    val broker = new FakeBroker
    assert(TopicAdmin.ensureTopic(broker.admin(), "absa-reviews",
      partitions = 3) === TopicAdmin.Created)
    val admin2 = broker.admin()
    val out2 = TopicAdmin.ensureTopic(admin2, "absa-reviews",
      partitions = 3)
    assert(out2 === TopicAdmin.AlreadyExists)
    // the existing topic is NOT re-created or re-configured
    assert(broker.topics("absa-reviews") === ((3, 1.toShort)))
    assert(admin2.closed)
  }

  test("broker failure degrades to Skipped and still closes the admin") {
    val broker = new FakeBroker
    val boom = new RuntimeException("broker unreachable")
    broker.failWith = Some(boom)
    val admin = broker.admin()
    TopicAdmin.ensureTopic(admin, "absa-reviews") match {
      case TopicAdmin.Skipped(cause) => assert(cause eq boom)
      case other => fail(s"expected Skipped, got $other")
    }
    assert(admin.closed, "admin must be closed on the failure path too")
    assert(broker.topics.isEmpty)
  }

  test("close failure does not mask the creation outcome") {
    val broker = new FakeBroker
    val admin = new RecordingAdmin(broker) {
      override def close(): Unit = {
        super.close()
        throw new IllegalStateException("close raced shutdown")
      }
    }
    assert(TopicAdmin.ensureTopic(admin, "t") === TopicAdmin.Created)
    assert(broker.topics.contains("t"))
  }

  test("distinct topics provision independently") {
    val broker = new FakeBroker
    assert(TopicAdmin.ensureTopic(broker.admin(), "absa-reviews")
      === TopicAdmin.Created)
    assert(TopicAdmin.ensureTopic(broker.admin(), "vehicle-frames",
      partitions = 2, replication = 2.toShort) === TopicAdmin.Created)
    assert(broker.topics.keySet === Set("absa-reviews", "vehicle-frames"))
    assert(broker.topics("vehicle-frames") === ((2, 2.toShort)))
  }
}
