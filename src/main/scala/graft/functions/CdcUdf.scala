package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF0, UDF1, UDF2, UDF3, UDF4}
import org.apache.spark.sql.types.DataType

/** User-defined scalar function surface, mirroring the reference's
  * `UserDefinedFunction` (flink-cdc-common/src/main/java/org/apache/flink/cdc/
  * common/udf/UserDefinedFunction.java:28-48): an `eval`, an optional declared
  * return type, and open/close lifecycle. Registered per pipeline from
  * `user-defined-function: {name, classpath}` YAML
  * (cli/parser/YamlPipelineDefinitionParser.java:87).
  */
trait CdcUdf extends Serializable {
  def name: String
  def returnType: DataType
  def eval(args: Seq[Any]): Any
  def open(): Unit = ()
  def close(): Unit = ()
  /** Number of arguments eval expects (0-4 supported, like the examples). */
  def arity: Int = 1
}

object CdcUdf {
  /** Adapt and register on a session; `open()` runs once on the driver here
    * (executor-side open/close would wrap eval in a lazy initializer).
    */
  def register(spark: SparkSession, u: CdcUdf): Unit = {
    u.open()
    u.arity match {
      case 0 => spark.udf.register(u.name, new UDF0[Any] {
        override def call(): Any = u.eval(Nil) }, u.returnType)
      case 1 => spark.udf.register(u.name, new UDF1[Any, Any] {
        override def call(a: Any): Any = u.eval(Seq(a)) }, u.returnType)
      case 2 => spark.udf.register(u.name, new UDF2[Any, Any, Any] {
        override def call(a: Any, b: Any): Any = u.eval(Seq(a, b)) }, u.returnType)
      case 3 => spark.udf.register(u.name, new UDF3[Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any): Any = u.eval(Seq(a, b, c)) }, u.returnType)
      case 4 => spark.udf.register(u.name, new UDF4[Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any, d: Any): Any = u.eval(Seq(a, b, c, d)) }, u.returnType)
      case n => throw new IllegalArgumentException(s"unsupported arity $n")
    }
  }

  /** Instantiate by classpath like the reference's UDF descriptor
    * (runtime/operators/transform/UserDefinedFunctionDescriptor.java:85-103).
    */
  def fromClasspath(spark: SparkSession, className: String): CdcUdf = {
    val u = Class.forName(className).getDeclaredConstructor().newInstance().asInstanceOf[CdcUdf]
    register(spark, u)
    u
  }
}
