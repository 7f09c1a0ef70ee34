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

  /** Java/Scala eval-method return class → Spark type, for UDF classes that
    * declare no CDC return type (the Flink-`ScalarFunction` shape).
    */
  private def sparkTypeOf(c: Class[_]): DataType = {
    import org.apache.spark.sql.types._
    c match {
      case x if x == classOf[String] => StringType
      case x if x == java.lang.Integer.TYPE || x == classOf[java.lang.Integer] => IntegerType
      case x if x == java.lang.Long.TYPE || x == classOf[java.lang.Long] => LongType
      case x if x == java.lang.Double.TYPE || x == classOf[java.lang.Double] => DoubleType
      case x if x == java.lang.Float.TYPE || x == classOf[java.lang.Float] => FloatType
      case x if x == java.lang.Boolean.TYPE || x == classOf[java.lang.Boolean] => BooleanType
      case x if x == java.lang.Short.TYPE || x == classOf[java.lang.Short] => ShortType
      case x if x == java.lang.Byte.TYPE || x == classOf[java.lang.Byte] => ByteType
      case x if x == classOf[Array[Byte]] => BinaryType
      case x if x == classOf[java.math.BigDecimal] => DecimalType(38, 18)
      case x if x == classOf[java.sql.Timestamp] => TimestampType
      case x if x == classOf[java.sql.Date] => DateType
      case other => throw new IllegalArgumentException(
        s"cannot infer a Spark type for eval() returning $other; implement CdcUdf.returnType")
    }
  }

  /** Adapt any class with a public `eval(...)` method — the reference accepts
    * both its own `UserDefinedFunction` and plain Flink-`ScalarFunction`
    * classes by duck-typing on `eval`
    * (runtime/operators/transform/UserDefinedFunctionDescriptor.java:85-103).
    * Return type comes from the eval signature; `open()`/`close()` lifecycle
    * methods are honored when present.
    */
  private def resolveEval(cls: Class[_]): java.lang.reflect.Method = {
    val evals = cls.getMethods.filter(m => m.getName == "eval" && !m.isBridge)
    require(evals.nonEmpty, s"${cls.getName} is neither a CdcUdf nor has an eval() method")
    // a registered UDF binds ONE signature; silently picking among overloads
    // would register one arity and fail the others at invoke time with an
    // opaque reflection error — reject up front with the remedy instead
    require(evals.length == 1,
      s"${cls.getName} declares ${evals.length} eval(...) overloads " +
        s"(${evals.map(_.getParameterTypes.map(_.getSimpleName).mkString("(", ",", ")"))
          .sorted.mkString(", ")}); a registered function binds one signature — " +
        "split the overloads into separate classes and register each under its own name")
    evals.head
  }

  /** Serializable adapter: `java.lang.reflect.Method` (and an arbitrary UDF
    * instance) cannot ship in a task closure, so only the CLASS NAME is
    * captured — instance and method re-resolve lazily on each JVM (driver
    * for registration, every executor the first time a task evaluates the
    * UDF). `open()` therefore runs once per executor too, which is the
    * lifecycle a codec/model-loading UDF actually wants.
    */
  private final class EvalClassUdf(className: String, udfName: String,
                                   val returnType: DataType, val evalArity: Int)
      extends CdcUdf {
    @transient private lazy val cls = Class.forName(className)
    @transient private lazy val inst = {
      val i = cls.getDeclaredConstructor().newInstance()
      lifecycle("open", i)
      i
    }
    @transient private lazy val method = resolveEval(cls)
    private def lifecycle(name: String, on: Any): Unit =
      cls.getMethods.find(x => x.getName == name && x.getParameterCount == 0)
        .foreach(_.invoke(on))
    override def name: String = udfName
    override def arity: Int = evalArity
    override def eval(args: Seq[Any]): Any =
      method.invoke(inst, args.map(_.asInstanceOf[AnyRef]): _*)
    override def open(): Unit = { val _ = inst }
    override def close(): Unit = lifecycle("close", inst)
  }

  private def adaptEvalClass(cls: Class[_], udfName: String): CdcUdf = {
    val m = resolveEval(cls)
    new EvalClassUdf(cls.getName, udfName, sparkTypeOf(m.getReturnType), m.getParameterCount)
  }

  /** Instantiate by classpath like the reference's UDF descriptor
    * (runtime/operators/transform/UserDefinedFunctionDescriptor.java:85-103):
    * a [[CdcUdf]] registers as-is; any other class with a public `eval`
    * method is adapted (Flink-`ScalarFunction` compatibility). `name`
    * overrides the function name (the YAML `user-defined-function: {name}`),
    * falling back to the UDF's own / the class simple name.
    */
  def fromClasspath(spark: SparkSession, className: String,
                    name: Option[String] = None): CdcUdf = {
    val cls = Class.forName(className)
    val inst = cls.getDeclaredConstructor().newInstance()
    val u = inst match {
      case c: CdcUdf =>
        name match {
          case Some(n) if n != c.name => new CdcUdf {
            override def name: String = n
            override def returnType: DataType = c.returnType
            override def arity: Int = c.arity
            override def eval(args: Seq[Any]): Any = c.eval(args)
            override def open(): Unit = c.open()
            override def close(): Unit = c.close()
          }
          case _ => c
        }
      case _ =>
        adaptEvalClass(cls, name.getOrElse(cls.getSimpleName.toLowerCase))
    }
    register(spark, u)
    u
  }
}
