package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier,
  TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException,
  ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** SQL surface for the lake catalog's views — `CREATE [OR REPLACE]
  * VIEW` / `DROP VIEW` / `SHOW VIEWS` / `SELECT`, the way Iceberg's
  * Spark extensions wire connector views: vanilla Spark 4.1 ships the
  * DSv2 `ViewCatalog` API but `ResolveSessionCatalog` still throws
  * "does not support views" for every non-session catalog, so the
  * extension layer supplies the missing wiring itself —
  *
  *  - [[GraftViewSqlParser]] intercepts the three DDL shapes when
  *    they explicitly target `graft_lake.lake.<name>` (everything
  *    else delegates verbatim to Spark's parser);
  *  - [[ResolveGraftLakeViews]] substitutes a referenced lake view's
  *    STORED SQL into the plan during resolution (definer-text
  *    semantics, re-resolved against the table's CURRENT snapshot —
  *    the Trino connector-view model);
  *  - the storage is [[GraftLakeViews]]' descriptor, shared with the
  *    programmatic [[GraftLakeCatalog]] `ViewCatalog` implementation,
  *    so API-created and SQL-created views are the same objects.
  *
  * Registered from [[graft.plans.GraftExtensions]]. */
object LakeViewSql {

  private[sources] def lakeRoot(session: SparkSession): String = {
    val r = session.conf.getOption("spark.sql.catalog.graft_lake.path")
    require(r.isDefined,
      "lake views need spark.sql.catalog.graft_lake.path")
    r.get
  }

  /** The three intercepted shapes. Backticks optional, case
    * insensitive, dotall for multi-line view bodies. */
  private[sources] val CreateV =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+`?graft_lake`?\s*\.\s*`?lake`?\s*\.\s*`?(\w+)`?\s+AS\s+(.+)""".r
  private[sources] val DropV =
    """(?is)\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?`?graft_lake`?\s*\.\s*`?lake`?\s*\.\s*`?(\w+)`?\s*;?\s*""".r
  private[sources] val ShowV =
    """(?is)\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+`?graft_lake`?\s*\.\s*`?lake`?\s*;?\s*""".r

  /** Trino's `TABLESAMPLE BERNOULLI(p)` / `TABLESAMPLE SYSTEM(p)`
    * (reference surface: stock-Trino SQL — e.g. the demo's ad-hoc
    * notebook queries can sample scans) rewritten to Spark's
    * `TABLESAMPLE (p PERCENT) REPEATABLE (seed)` with a MAGIC seed
    * per variant. The seed is not an RNG seed here: it marks the
    * Sample node for [[graft.plans.RewriteTrinoTablesample]], which
    * replaces it with the DETERMINISTIC hash-based form (BERNOULLI →
    * a shard-key-hash row filter, the same portable-hash discipline
    * as the corpus_sample_* kernels; SYSTEM → metadata-only shard
    * sampling pushed into the lake scan). Deterministic sampling is
    * the variant a data pipeline can actually use: reproducible
    * across runs, engines and cluster sizes. */
  val BernoulliSampleSeed = 60477001L
  val SystemSampleSeed = 60477002L
  private val BernoulliRe =
    """(?i)TABLESAMPLE\s+BERNOULLI\s*\(\s*(\d+(?:\.\d+)?)\s*\)""".r
  private val SystemRe =
    """(?i)TABLESAMPLE\s+SYSTEM\s*\(\s*(\d+(?:\.\d+)?)\s*\)""".r

  private[sources] def rewriteTablesample(sql: String): String = {
    if (!sql.toLowerCase(java.util.Locale.ROOT).contains("tablesample"))
      return sql
    val b = BernoulliRe.replaceAllIn(sql, m =>
      s"TABLESAMPLE (${m.group(1)} PERCENT) " +
        s"REPEATABLE ($BernoulliSampleSeed)")
    SystemRe.replaceAllIn(b, m =>
      s"TABLESAMPLE (${m.group(1)} PERCENT) " +
        s"REPEATABLE ($SystemSampleSeed)")
  }
}

class GraftViewSqlParser(delegate: ParserInterface)
    extends ParserInterface {
  import LakeViewSql._

  override def parsePlan(sqlText: String): LogicalPlan =
    sqlText match {
      case CreateV(orReplace, name, body) =>
        CreateLakeViewCommand(name, body.trim.stripSuffix(";"),
          replace = orReplace != null)
      case DropV(ifExists, name) =>
        DropLakeViewCommand(name, ifExists = ifExists != null)
      case ShowV() => ShowLakeViewsCommand()
      case _ => delegate.parsePlan(rewriteTablesample(sqlText))
    }

  /** `spark.sql(text, args)` routes here, not parsePlan — the
    * parameter bindings live in the delegate's handling, so anything
    * that isn't our DDL must delegate THIS method (inheriting the
    * interface default would drop the bindings and every
    * parameterized query would fail UNBOUND_SQL_PARAMETER). */
  override def parsePlanWithParameters(sqlText: String,
      context: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    sqlText match {
      case CreateV(_, _, _) | DropV(_, _) | ShowV() =>
        parsePlan(sqlText)
      case _ => delegate.parsePlanWithParameters(
        rewriteTablesample(sqlText), context)
    }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(
      sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewriteTablesample(sqlText))
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** `CREATE [OR REPLACE] VIEW graft_lake.lake.<name> AS <sql>`: the
  * body is analyzed NOW (catching bad SQL and capturing the
  * creation-time schema for the descriptor), stored as TEXT, and
  * re-resolved on every read. */
case class CreateLakeViewCommand(name: String, sql: String,
    replace: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val root = LakeViewSql.lakeRoot(session)
    require(!new java.io.File(root, s"$name.lake.json").exists(),
      s"$name already exists as a lake table")
    if (!replace)
      require(!GraftLakeViews.viewFile(root, name).exists(),
        s"view graft_lake.lake.$name already exists " +
          "(use CREATE OR REPLACE VIEW)")
    val schema = org.apache.spark.sql.graft.Bridge
      .ofRows(session, session.sessionState.sqlParser.parsePlan(sql))
      .schema
    GraftLakeViews.write(root, new ViewInfo(
      Identifier.of(Array("lake"), name), sql,
      session.catalog.currentCatalog(),
      Array(session.catalog.currentDatabase), schema,
      schema.fieldNames, Array.empty, Array.empty,
      java.util.Map.of()))
    Nil
  }
}

case class DropLakeViewCommand(name: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val f = GraftLakeViews.viewFile(LakeViewSql.lakeRoot(session), name)
    if (!f.exists() && !ifExists)
      throw new IllegalArgumentException(
        s"view graft_lake.lake.$name does not exist")
    f.delete(): Unit
    Nil
  }
}

case class ShowLakeViewsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)(),
    AttributeReference("isTemporary",
      org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] =
    GraftLakeViews.list(LakeViewSql.lakeRoot(session))
      .map(n => Row("lake", n, false))
}

/** Resolution: `graft_lake.lake.<name>` referencing a stored view
  * substitutes the view's parsed SQL text under a SubqueryAlias; the
  * fixpoint analyzer then resolves the substituted body (including
  * nested views) like any inlined subquery.
  *
  * DEFINER CONTEXT (the Trino connector-view model): unqualified and
  * catalog-less relations inside the stored body are qualified with the
  * `currentCatalog`/`currentNamespace` captured at CREATE VIEW before
  * substitution, so the body resolves the same way in EVERY reading
  * session — a reader sitting in a different current catalog cannot
  * silently rebind the view to its own tables. Names the body itself
  * defines as CTEs are exempt (they must keep binding to the CTE). */
case class ResolveGraftLakeViews(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def qualify(body: LogicalPlan,
      cat: String, ns: Seq[String]): LogicalPlan = {
    // the analyzer's Substitution batch already ran before this rule
    // fires, so the freshly-parsed body's CTEs must be substituted
    // here (the Iceberg ResolveViews idiom) — afterwards every CTE
    // reference is a CTERelationRef and any UnresolvedRelation left is
    // genuinely external, safe to qualify
    val substituted =
      org.apache.spark.sql.catalyst.analysis.CTESubstitution(body)
    substituted.resolveOperatorsUp {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
        r.copy(multipartIdentifier =
          (cat +: ns) :+ r.multipartIdentifier.head)
      case r: UnresolvedRelation if r.multipartIdentifier.length == 2 =>
        r.copy(multipartIdentifier = cat +: r.multipartIdentifier)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation
          if u.multipartIdentifier.length == 3 &&
            u.multipartIdentifier(0).equalsIgnoreCase("graft_lake") &&
            u.multipartIdentifier(1).equalsIgnoreCase("lake") &&
            session.conf
              .getOption("spark.sql.catalog.graft_lake.path")
              .exists(r => GraftLakeViews
                .viewFile(r, u.multipartIdentifier(2)).exists()) =>
        val name = u.multipartIdentifier(2)
        val view = GraftLakeViews.read(
          LakeViewSql.lakeRoot(session),
          Identifier.of(Array("lake"), name))
        SubqueryAlias(name, qualify(
          session.sessionState.sqlParser.parsePlan(view.query()),
          view.currentCatalog(), view.currentNamespace().toSeq))
    }
}
