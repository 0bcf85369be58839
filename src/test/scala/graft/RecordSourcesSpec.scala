package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RecordSources

/** Kinesis source option surface (reference S1 — config.aws.reference
  * .hocon input block): the HOCON → Kinesis config → connector-option
  * mapping, testable without a Kinesis connector on the classpath.
  */
class RecordSourcesSpec extends AnyFunSuite {

  private val hocon =
    """
      |"input": {
      |  "streamName": "snowplow-sdjs"
      |  "appName": "snowplow-s3-loader"
      |  "initialPosition": { "type": "TRIM_HORIZON" }
      |  "retrievalMode": {
      |    "type": "Polling"
      |    "maxRecords": 750
      |    "idleTimeBetweenReads": "1500 millis"
      |  }
      |}
    """.stripMargin

  test("reference input block parses to the Kinesis polling surface") {
    val k = RecordSources.kinesisFromHocon(hocon, region = "eu-central-1")
      .toOption.get
    assert(k.streamName == "snowplow-sdjs")
    assert(k.initialPosition == "TRIM_HORIZON")
    assert(k.maxRecords == 750)
    assert(k.idleTimeBetweenReadsMs == 1500L)
  }

  test("connector options carry the full polling surface") {
    val k = RecordSources.Kinesis("s", "eu-west-1",
      initialPosition = "AT_TIMESTAMP",
      initialTimestamp = Some("2023-01-01T00:00:00Z"))
    val opts = RecordSources.kinesisOptions(k)
    assert(opts("streamName") == "s")
    assert(opts("region") == "eu-west-1")
    assert(opts("initialPosition") == "AT_TIMESTAMP")
    assert(opts("initialTimestamp") == "2023-01-01T00:00:00Z")
    assert(opts("maxFetchRecordsPerShard") == "750")
    assert(opts("minFetchPeriodMillis") == "1500")
  }

  test("defaults and validation: missing stream / bad position are errors") {
    assert(RecordSources.kinesisFromHocon("{}", "r").isLeft)
    assert(RecordSources.kinesisFromHocon(
      """input { streamName = "s", initialPosition { type = "NOPE" } }""",
      "r").isLeft)
    val k = RecordSources.kinesisFromHocon(
      """input { streamName = "s" }""", "r").toOption.get
    assert(k.initialPosition == "LATEST")
    assert(k.maxRecords == 750 && k.idleTimeBetweenReadsMs == 1500L)
  }
}
