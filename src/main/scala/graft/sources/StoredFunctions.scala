package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BoundReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, StructType}

/** Catalog-stored SQL functions (reference: paimon-api
  * .../function/, CreateFunctionProcedure.java and the Spark-side
  * PaimonFunctionResolver — function definitions persisted in the
  * catalog and resolved by name at query time).
  *
  * A function is a named, typed SQL expression macro persisted as JSON
  * under `<warehouse>/<db>/.functions/<name>.json`:
  * {{{
  *   CALL cat.sys.create_function('db.double_plus', 'x INT', 'x * 2 + 1')
  *   SELECT cat.db.double_plus(21)   -- resolves through FunctionCatalog
  * }}}
  *
  * At load the body is parsed and run through Spark's ANALYZER against
  * the declared parameter schema (full resolution + implicit type
  * coercion, driver-side, once), then attribute references are bound
  * to parameter ordinals. Evaluation on executors is the interpreted
  * `Expression.eval` over the input row — no codegen needed, and the
  * bound expression tree serializes with the function. */
object StoredFunctions {

  private case class FnDef(params: String, body: String)

  private def fnPath(warehouse: String, ident: Identifier): String =
    (ident.namespace() :+ ".functions" :+ s"${ident.name()}.json")
      .mkString(s"$warehouse/", "/", "")

  /** Validate (parse + analyze) and persist a function definition. */
  def create(warehouse: String, qualifiedName: String,
      paramsDdl: String, body: String): Unit = {
    val parts = qualifiedName.split("\\.")
    require(parts.length >= 2, "function name must be db.name")
    val ident = Identifier.of(parts.dropRight(1), parts.last)
    val (_, bound) = resolve(paramsDdl, body)
    require(bound.deterministic,
      "stored functions must be deterministic expressions")
    val io = new graft.core.LocalFileIO
    io.writeString(fnPath(warehouse, ident),
      graft.core.Json.write(FnDef(paramsDdl, body)))
  }

  def drop(warehouse: String, qualifiedName: String): Unit = {
    val parts = qualifiedName.split("\\.")
    val ident = Identifier.of(parts.dropRight(1), parts.last)
    new graft.core.LocalFileIO().delete(fnPath(warehouse, ident))
  }

  /** Replace an existing function's definition in place (reference:
    * AlterFunctionProcedure). Validates before overwriting. */
  def alter(warehouse: String, qualifiedName: String,
      paramsDdl: String, body: String): Unit = {
    val parts = qualifiedName.split("\\.")
    require(parts.length >= 2, "function name must be db.name")
    val ident = Identifier.of(parts.dropRight(1), parts.last)
    require(new graft.core.LocalFileIO().exists(fnPath(warehouse, ident)),
      s"no stored function $qualifiedName")
    create(warehouse, qualifiedName, paramsDdl, body)
  }

  /** Load a stored function for FunctionCatalog resolution. */
  def load(warehouse: String, ident: Identifier): Option[UnboundFunction] = {
    val io = new graft.core.LocalFileIO
    val path = fnPath(warehouse, ident)
    if (!io.exists(path)) return None
    val d = graft.core.Json.read(io.readString(path), classOf[FnDef])
    val (schema, bound) = resolve(d.params, d.body)
    Some(new StoredSqlFunction(ident.name(), schema, bound))
  }

  /** Parse `body`, analyze it against the `paramsDdl` schema (name
    * resolution + type coercion via the real analyzer), and bind
    * parameter references to input ordinals. */
  private def resolve(paramsDdl: String, body: String): (StructType, Expression) = {
    val spark = SparkSession.active
    val schema = StructType.fromDDL(paramsDdl)
    val attrs = schema.fields.toIndexedSeq
      .map(f => AttributeReference(f.name, f.dataType, f.nullable)())
    val parsed = spark.sessionState.sqlParser.parseExpression(body)
    val plan = Project(Seq(Alias(parsed, "result")()), LocalRelation(attrs))
    val analyzed = spark.sessionState.analyzer.execute(plan)
    val resolvedExpr = analyzed.collectFirst {
      case Project(Seq(a: Alias), _) => a.child
    }.getOrElse(throw new IllegalArgumentException(
      s"cannot analyze function body: $body"))
    require(resolvedExpr.resolved,
      s"function body does not resolve against ($paramsDdl): $body")
    val bound = resolvedExpr.transform {
      case a: AttributeReference =>
        val ord = attrs.indexWhere(_.exprId == a.exprId)
        require(ord >= 0, s"unresolvable reference ${a.name} in: $body")
        BoundReference(ord, a.dataType, a.nullable)
    }
    (schema, bound)
  }
}

/** A stored SQL-expression function bound for execution: interpreted
  * eval of the analyzed, ordinal-bound Catalyst expression. The
  * expression tree ships with the closure to executors. */
private[sources] class StoredSqlFunction(
    fnName: String, params: StructType, bound: Expression)
    extends UnboundFunction with Serializable {

  override def name(): String = fnName
  override def description(): String =
    s"$fnName(${params.toDDL}): stored SQL function"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == params.fields.length,
      s"$fnName expects ${params.fields.length} arguments")
    val expr = bound
    val ps = params
    val nm = fnName
    new ScalarFunction[Any] with Serializable {
      override def inputTypes(): Array[DataType] = ps.fields.map(_.dataType)
      override def resultType(): DataType = expr.dataType
      override def isResultNullable: Boolean = expr.nullable
      override def name(): String = nm
      override def produceResult(input: InternalRow): Any = expr.eval(input)
    }
  }
}
