package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The store's bucket transform as a DSv2 catalog function — the piece
  * that makes storage-partitioned joins (SPJ) plan: when a
  * [[GraftTable]] scan reports `KeyGroupedPartitioning(bucket(n, key))`,
  * Spark resolves the `bucket` transform through the table's catalog
  * ([[GraftCatalog]] implements `FunctionCatalog`) and matches the two
  * sides by `canonicalName` + bucket count, so a join of two graft tables
  * bucketed the same way needs NO shuffle — partitions pair up by bucket
  * id. The function body reproduces [[GraftStore.bucketExpr]] exactly
  * (xxhash64 with Spark's default seed, pmod n) for the
  * shuffle-one-side variants that evaluate it on rows. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, keys...): graft store bucket id = pmod(xxhash64(keys), n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket expects (numBuckets, key columns...), got $inputType")
    require(inputType.fields.head.dataType == IntegerType,
      "first bucket argument must be the integer bucket count")
    new GraftBoundBucket(inputType)
  }
}

final class GraftBoundBucket(input: StructType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = input.fields.map(_.dataType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isResultNullable: Boolean = false

  override def produceResult(row: InternalRow): Integer = {
    val n = row.getInt(0)
    var h = 42L // xxhash64's default seed, matching GraftStore.bucketExpr
    var i = 1
    while (i < input.length) {
      val dt = input.fields(i).dataType
      h = XxHash64Function.hash(row.get(i, dt), dt, h)
      i += 1
    }
    (((h % n) + n) % n).toInt
  }
}
