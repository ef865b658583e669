package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** V2 FunctionCatalog (`spark.sql.catalog.graft_fns`) — the remaining
  * public extension surface after functions / optimizer rule / planner
  * strategy / DSv2 read / DSv2 write: CATALOG-RESOLVED functions, the
  * mechanism a multi-tenant platform uses to ship engine functions
  * without touching every session's registry (Iceberg exposes its
  * bucket/truncate transforms exactly this way). `SELECT
  * graft_fns.fns.hash60(expr)` resolves through this plugin in ANY
  * session that carries the catalog conf — no GraftExtensions install
  * required, no session-local registration.
  *
  * `hash60` is the engine's one canonical cross-engine hash (the low 15
  * hex digits of md5 as a non-negative BIGINT — [[graft.operators
  * .TextOps.hash60]]'s contract, replayable in DuckDB), exposed with
  * BOTH evaluation paths the V2 function API defines: the reflective
  * MAGIC METHOD `invoke(UTF8String): Long`, which Catalyst compiles to
  * a direct (codegen-friendly) call, and the row-based `produceResult`
  * fallback; FunctionCatalogSpec pins the catalog value equal to the
  * expression-registry value and to the JVM twin on the same inputs. */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {
  private var catalogName = "graft_fns"
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  private val ns = Array("fns")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(ns) || namespace.isEmpty)
      Array(Identifier.of(ns, "hash60"))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(ns) && ident.name == "hash60")
      Hash60Unbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)
}

private object Hash60Unbound extends UnboundFunction {
  override def name(): String = "hash60"
  override def description(): String =
    "hash60(str) - low 15 hex digits of md5(str) as a non-negative BIGINT"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == StringType,
      s"hash60 takes one STRING argument; got $inputType")
    new Hash60Bound
  }
}

/** Both V2 evaluation paths: Catalyst finds `invoke` reflectively and
  * plans a direct call (StaticInvoke-style, inside codegen); engines
  * that skip the magic path fall back to `produceResult`. */
private class Hash60Bound extends ScalarFunction[java.lang.Long] {
  override def name(): String = "hash60"
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = true // null in -> null out
  override def isDeterministic: Boolean = true

  def invoke(s: UTF8String): java.lang.Long =
    if (s == null) null
    else java.lang.Long.valueOf(graft.operators.TextOps.hash60Jvm(s.toString))

  override def produceResult(input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) null
    else invoke(input.getUTF8String(0))
}
