package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Config surface of the reference (`PulsarPartitionLevelStreamConfig.java`):
  * required broker list, defaults, silent fallback on malformed ints.
  */
class SourceConfigSpec extends AnyFunSuite {

  private val base = Map(SourceConfig.BrokerListKey -> "broker1:6650,broker2:6650")

  test("defaults match the reference envelope (500 msgs / 10 MiB / 100 ms)") {
    val c = SourceConfig.fromMap(base)
    assert(c.maxBatchMessages === 500)
    assert(c.maxBatchBytes === 10 * 1024 * 1024)
    assert(c.batchTimeoutMillis === 100)
    assert(c.brokers === "broker1:6650,broker2:6650")
  }

  test("broker list is required") {
    assertThrows[IllegalArgumentException](SourceConfig.fromMap(Map.empty))
  }

  test("explicit values parsed") {
    val c = SourceConfig.fromMap(
      base ++ Map(
        SourceConfig.MaxMsgsKey -> "42",
        SourceConfig.MaxBytesKey -> "1024",
        SourceConfig.TimeoutKey -> "250"
      )
    )
    assert((c.maxBatchMessages, c.maxBatchBytes, c.batchTimeoutMillis) === ((42, 1024, 250)))
  }

  test("malformed int silently falls back to default (reference :97-107)") {
    val c = SourceConfig.fromMap(base + (SourceConfig.MaxMsgsKey -> "not-a-number"))
    assert(c.maxBatchMessages === 500)
  }
}
