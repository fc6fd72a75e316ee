package graft.schemas

import org.apache.spark.sql.types._

/** The reference's two positional CSV schemas for the heterogeneous
  * yellow/green taxi feed (SURVEY.md §1.3, FIXTURES.md §1).
  *
  * The feed mixes 20-column yellow rows and 22-column green rows in every
  * file; CSV binds schema fields by position, so each declared schema is a
  * deliberate overlay:
  *
  *   - [[green22]] (`/root/reference/Task2.py:11-34`): the true green
  *     layout. Both row types agree on positions 1-4, so field 4
  *     (`Lpep_dropoff_datetime`) is the real dropoff timestamp for BOTH —
  *     the only column Task2 reads. All later fields are garbage for
  *     yellow rows but never read.
  *   - [[split24]] (`Task3.py:17-42`, `Task4.py:28-53`): positions 9-12
  *     are split into Green_/Yellow_ dropoff coord pairs; the real coords
  *     land at 9-10 for green rows and 11-12 for yellow rows, and a
  *     per-type conditional coalesce ([[graft.streaming.TaxiPipelines]])
  *     reconstructs them. This overlay + coalesce IS the reference's
  *     union mechanism for the two layouts.
  *
  * Coords are FloatType on purpose (32-bit fidelity with the reference;
  * SURVEY §7.4) — generalized operators use doubles downstream.
  */
object TaxiSchemas {

  private def f(name: String, t: DataType) = StructField(name, t, nullable = true)

  val green22: StructType = StructType(Seq(
    f("type", StringType),
    f("VendorID", IntegerType),
    f("lpep_pickup_datetime", TimestampType),
    f("Lpep_dropoff_datetime", TimestampType),
    f("Store_and_fwd_flag", StringType),
    f("RateCodeID", IntegerType),
    f("Pickup_longitude", FloatType),
    f("Pickup_latitude", FloatType),
    f("Dropoff_longitude", FloatType),
    f("Dropoff_latitude", FloatType),
    f("Passenger_count", IntegerType),
    f("Trip_distance", FloatType),
    f("Fare_amount", FloatType),
    f("Extra", FloatType),
    f("MTA_tax", FloatType),
    f("Tip_amount", FloatType),
    f("Tolls_amount", FloatType),
    f("Ehail_fee", FloatType),
    f("improvement_surcharge", FloatType),
    f("Total_amount", FloatType),
    f("Payment_type", IntegerType),
    f("Trip_type", IntegerType)))

  val split24: StructType = StructType(Seq(
    f("type", StringType),
    f("VendorID", IntegerType),
    f("lpep_pickup_datetime", TimestampType),
    f("Lpep_dropoff_datetime", TimestampType),
    f("Store_and_fwd_flag", StringType),
    f("RateCodeID", IntegerType),
    f("Pickup_longitude", FloatType),
    f("Pickup_latitude", FloatType),
    f("Green_Dropoff_longitude", FloatType),
    f("Green_Dropoff_latitude", FloatType),
    f("Yellow_Dropoff_longitude", FloatType),
    f("Yellow_Dropoff_latitude", FloatType),
    f("Passenger_count", IntegerType),
    f("Trip_distance", FloatType),
    f("Fare_amount", FloatType),
    f("Extra", FloatType),
    f("MTA_tax", FloatType),
    f("Tip_amount", FloatType),
    f("Tolls_amount", FloatType),
    f("Ehail_fee", FloatType),
    f("improvement_surcharge", FloatType),
    f("Total_amount", FloatType),
    f("Payment_type", IntegerType),
    f("Trip_type", IntegerType)))
}
