package graft.streaming

/** Typed boundary schemas for the two pipelines (SURVEY.md §1.2/§1.3,
  * FIXTURES.md §1/§4/§5).
  */
object Model {

  /** ABSA Kafka record (`spark_kafka_consumer_dag.py:49-52`). */
  final case class Review(id: String, review: String)

  /** Vehicle Kafka record (`vehicle_consumer.py:44-48`): epoch seconds with
    * fraction + base64 JPEG payload.
    */
  final case class Frame(camera_id: String, timestamp: Double,
      frame_data: String)

  /** Vehicle detection result (`vehicle_consumer.py:106-109`). The
    * reference's error path returns a bare `0` (latent type bug,
    * `vehicle_consumer.py:104`); we return a typed Detection(0, "") —
    * intentional divergence per SURVEY §7.4.
    */
  final case class Detection(count: Int, vehicle_types: String)

  /** `vehicle_counts` output row (`db/init.sql:4-11`). */
  final case class VehicleCount(camera_id: String, vehicle_type: String,
      count: Int, frame_time: java.sql.Timestamp,
      processed_at: java.sql.Timestamp)
}
