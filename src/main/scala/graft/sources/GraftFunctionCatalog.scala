package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.NativeExprs

/** A DataSource V2 FUNCTION catalog — the remaining catalog-plugin rung
  * of SURVEY §4's extension ladder (expression → plan/strategy →
  * connector → CATALOG). Registered at runtime via
  * `spark.conf.set("spark.sql.catalog.graft_fns", classOf[...].getName)`
  * and invoked catalog-qualified: `SELECT graft_fns.fns.mix64(id)`.
  *
  * Why this beats a registered UDF at scale: each function is a
  * [[ScalarFunction]] with the MAGIC METHOD (`invoke`), so the analyzer
  * plans a direct `Invoke` call — no closure serialization, no
  * row-boxing through a Scala function, codegen calls the JVM method
  * straight from the generated loop. The functions are the repo's
  * canonical mixers ([[NativeExprs.mix64]] / [[NativeExprs.hashUtf8]]),
  * which keeps every result closed-form oracle-able in DuckDB
  * (`DuckSketchSql.mix64Ctes` / `fnvRaw` port the same math).
  *
  * Binding is type-checked: `bind` rejects wrong arity/types with the
  * error message the analyzer surfaces, the V2 analog of
  * `checkInputDataTypes` on a native expression.
  */
class GraftFunctionCatalog extends FunctionCatalog {

  private var catName: String = "graft_fns"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName
  override def defaultNamespace(): Array[String] = Array("fns")

  private val ns = Array("fns")
  private val fns: Map[String, UnboundFunction] = Map(
    "mix64" -> Mix64Unbound,
    "hash64" -> Hash64Unbound)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(ns))
      fns.keys.toArray.sorted.map(Identifier.of(ns, _))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(ns) || ident.namespace.isEmpty)
      fns.getOrElse(ident.name,
        throw new NoSuchFunctionException(ident))
    else throw new NoSuchFunctionException(ident)
}

/** `mix64(bigint) → bigint` — the splitmix64 bijective mixer. */
object Mix64Unbound extends UnboundFunction {
  override def name(): String = "mix64"
  override def description(): String =
    "mix64(x BIGINT) -> BIGINT: splitmix64 finalizer, a bijection on int64"
  override def bind(inputType: StructType): BoundFunction = {
    // accept any integral argument: Spark casts to the bound
    // `inputTypes()` (BIGINT) after a successful bind
    val integral = inputType.length == 1 && (inputType.head.dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | LongType => true
      case _ => false
    })
    require(integral,
      s"mix64 takes exactly one integral argument, got ${inputType.simpleString}")
    Mix64Function
  }
}

object Mix64Function extends ScalarFunction[java.lang.Long] {
  override def name(): String = "mix64"
  override def canonicalName(): String = "graft.mix64"
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  /** The magic method the analyzer binds with a direct `Invoke`. */
  def invoke(x: Long): Long = NativeExprs.mix64(x)
  override def produceResult(input: InternalRow): java.lang.Long =
    NativeExprs.mix64(input.getLong(0))
}

/** `hash64(string) → bigint` — FNV-1a over UTF-8 bytes, then mix64
  * (identical to the native `graft_hash64` expression).
  */
object Hash64Unbound extends UnboundFunction {
  override def name(): String = "hash64"
  override def description(): String =
    "hash64(s STRING) -> BIGINT: FNV-1a over UTF-8 bytes + splitmix64 finalizer"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 && inputType.head.dataType == StringType,
      s"hash64 takes exactly one STRING argument, got ${inputType.simpleString}")
    Hash64Function
  }
}

object Hash64Function extends ScalarFunction[java.lang.Long] {
  override def name(): String = "hash64"
  override def canonicalName(): String = "graft.hash64"
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  def invoke(s: UTF8String): Long = NativeExprs.hashUtf8(s)
  override def produceResult(input: InternalRow): java.lang.Long =
    NativeExprs.hashUtf8(input.getUTF8String(0))
}
