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
    * `TABLESAMPLE (p PERCENT) REPEATABLE (marker)`. The marker seed
    * is parse-local plumbing, NOT the signal itself: right after the
    * delegate parses the rewritten text, [[GraftViewSqlParser]] finds
    * the Sample nodes carrying a marker seed and stamps them with
    * [[TrinoSampleTag]] — the OUT-OF-BAND signal
    * [[graft.plans.RewriteTrinoTablesample]] keys on to install the
    * DETERMINISTIC hash-based form (BERNOULLI → a key-hash row
    * filter, the same portable-hash discipline as the corpus_sample_*
    * kernels; SYSTEM → metadata-only shard sampling pushed into the
    * lake scan). Deterministic sampling is the variant a data
    * pipeline can actually use: reproducible across runs, engines and
    * cluster sizes.
    *
    * Marker seeds are allocated fresh per occurrence and skipped if
    * their digits appear ANYWHERE in the original statement, so a
    * user's genuine `REPEATABLE (n)` — any n, including the fixed
    * 60477001/60477002 the r16 design overloaded — can never be
    * mistaken for a marker: an untagged Sample is always vanilla
    * Spark's. */
  val TrinoSampleTag: org.apache.spark.sql.catalyst.trees.TreeNodeTag[String] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[String](
      "graft.trino_sample")
  private val MarkerBase = 60477000001L
  private val BernoulliRe =
    """(?i)TABLESAMPLE\s+BERNOULLI\s*\(\s*(\d+(?:\.\d+)?)\s*\)""".r
  private val SystemRe =
    """(?i)TABLESAMPLE\s+SYSTEM\s*\(\s*(\d+(?:\.\d+)?)\s*\)""".r

  /** Half-open `[start, end)` CODE spans of `sql` — everything
    * outside single-quoted literals (`''` and backslash escapes),
    * double-quoted literals/identifiers, backquoted identifiers,
    * `--` line comments and (nested) bracketed comments. The
    * TABLESAMPLE rewrite only touches code spans: r16 substituted
    * the raw text, so `INSERT INTO t VALUES ('TABLESAMPLE
    * BERNOULLI(30)')` silently corrupted the stored literal. */
  private[sources] def codeSpans(sql: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    val n = sql.length
    var i = 0
    var start = 0
    def close(endExcl: Int): Unit =
      if (endExcl > start) spans += ((start, endExcl))
    def quoted(q: Char): Unit = { // i sits ON the opening quote
      close(i); i += 1
      var done = false
      while (i < n && !done) {
        val c = sql.charAt(i)
        if (c == q) {
          if (i + 1 < n && sql.charAt(i + 1) == q) i += 2 // '' escape
          else { i += 1; done = true }
        } else if (c == '\\' && q != '`' && i + 1 < n) i += 2
        else i += 1
      }
      start = i
    }
    while (i < n) {
      sql.charAt(i) match {
        case '\'' | '"' | '`' => quoted(sql.charAt(i))
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          close(i); i += 2
          while (i < n && sql.charAt(i) != '\n') i += 1
          start = i
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          close(i); i += 2
          var depth = 1
          while (i < n && depth > 0) {
            if (sql.startsWith("/*", i)) { depth += 1; i += 2 }
            else if (sql.startsWith("*/", i)) { depth -= 1; i += 2 }
            else i += 1
          }
          start = i
        case _ => i += 1
      }
    }
    close(n)
    spans.result()
  }

  /** Rewritten statement + marker-seed → variant ("bernoulli" |
    * "system") for every Trino-TABLESAMPLE occurrence replaced. */
  private[sources] def rewriteTablesample(
      sql: String): (String, Map[Long, String]) = {
    if (!sql.toLowerCase(java.util.Locale.ROOT).contains("tablesample"))
      return (sql, Map.empty)
    val markers = Map.newBuilder[Long, String]
    var next = MarkerBase
    def alloc(variant: String): Long = {
      while (sql.contains(next.toString)) next += 1
      val m = next
      next += 1
      markers += ((m, variant))
      m
    }
    def rewriteCode(code: String): String = {
      val b = BernoulliRe.replaceAllIn(code, m =>
        s"TABLESAMPLE (${m.group(1)} PERCENT) " +
          s"REPEATABLE (${alloc("bernoulli")})")
      SystemRe.replaceAllIn(b, m =>
        s"TABLESAMPLE (${m.group(1)} PERCENT) " +
          s"REPEATABLE (${alloc("system")})")
    }
    val out = new StringBuilder
    var pos = 0
    codeSpans(sql).foreach { case (a, b) =>
      out.append(sql.substring(pos, a)) // literal/comment: verbatim
      out.append(rewriteCode(sql.substring(a, b)))
      pos = b
    }
    out.append(sql.substring(pos))
    (out.toString, markers.result())
  }

  /** Stamp [[TrinoSampleTag]] onto the Sample nodes the rewrite
    * introduced (matched by their parse-local marker seed). Tags ride
    * TreeNode copies through ANALYSIS (makeCopy/copyTagsFrom), but
    * optimizer rules like ColumnPruning rebuild Sample via case-class
    * copy(), which drops tags — which is why
    * [[graft.plans.RewriteTrinoTablesample]] consumes the tag as a
    * POST-HOC RESOLUTION rule, before any optimizer copy. */
  private[sources] def tagTrinoSamples(plan: LogicalPlan,
      markers: Map[Long, String]): LogicalPlan = {
    if (markers.nonEmpty) plan.foreach {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sample
          if markers.contains(s.seed) =>
        s.setTagValue(TrinoSampleTag, markers(s.seed))
      case _ => ()
    }
    plan
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
      case _ =>
        val (rw, markers) = rewriteTablesample(sqlText)
        tagTrinoSamples(delegate.parsePlan(rw), markers)
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
      case _ =>
        val (rw, markers) = rewriteTablesample(sqlText)
        tagTrinoSamples(
          delegate.parsePlanWithParameters(rw, context), markers)
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
  override def parseQuery(sqlText: String): LogicalPlan = {
    val (rw, markers) = rewriteTablesample(sqlText)
    tagTrinoSamples(delegate.parseQuery(rw), markers)
  }
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
