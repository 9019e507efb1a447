package graft.exec

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.catalog.Catalog
import graft.sem.LlamaSem
import graft.sqlfront.Ast._

/** Compiles the llamadb-dialect AST into DataFrame plans (SURVEY.md §3.1
  * step 5 ≙ this + Spark's analyzer). Everything stays declarative so
  * Catalyst supplies pushdown/pruning/join-selection/codegen — the
  * reference's row-at-a-time interpreter (`queryplan/execute/mod.rs`)
  * becomes whatever physical plan Catalyst picks.
  *
  * Reference semantics honored here:
  *   - lexically-scoped name resolution, inner-to-outer, ambiguity errors
  *     (`src/queryplan/source.rs:35-93`)
  *   - truthiness at every predicate site (WHERE/ON/HAVING): non-zero
  *     number / non-empty string is true (`variant.rs:171-182`)
  *   - five aggregates + count(*), whole-query aggregation, HAVING,
  *     bare-column-under-GROUP-BY → deterministic min() (SURVEY §2.1-2.3)
  *   - scalar subqueries must yield exactly one row → runtime error
  *     (`execute/mod.rs:308-337`); correlated subqueries decorrelated to
  *     a per-key join for equality correlation (SURVEY §7.3) — the
  *     reference re-executes per outer row, the O(n·m) form of the same
  *     semantics; aggregate subqueries follow standard SQL on empty
  *     groups (count→0), a documented deviation
  *   - `/` → NULL on zero divisor; `||` → display-form concat; sum()
  *     accumulates as double; `&`/`|` (panicking in the reference,
  *     `execute/mod.rs:267`) actually work
  *   - no scalar functions — any non-aggregate call is "unknown function
  *     name" (`queryplan/mod.rs:795-801`), for dialect fidelity
  */
class Compiler(spark: SparkSession, catalog: Catalog) {

  case class CompileError(msg: String) extends RuntimeException(msg)

  private val aggNames = Set("count", "sum", "avg", "min", "max")

  /** One FROM source visible in a scope. */
  private case class Source(alias: String, schema: StructType) {
    def has(col: String): Boolean =
      schema.fieldNames.exists(_.equalsIgnoreCase(col))
  }

  /** Lexical scope chain (reference `SourceScope`, `source.rs:9-93`).
    * Resolution returns (alias, isOuter). */
  private case class Scope(sources: Seq[Source], parent: Option[Scope]) {
    def resolve(c: String): Either[String, (String, Boolean)] = {
      val hits = sources.filter(_.has(c))
      if (hits.size > 1) Left(s"ambiguous column '$c'")
      else if (hits.size == 1) Right((hits.head.alias, false))
      else parent match {
        case Some(p) => p.resolve(c).map { case (a, _) => (a, true) }
        case None => Left(s"column '$c' does not exist")
      }
    }
    def resolveQualified(t: String, c: String)
        : Either[String, (String, Boolean)] =
      sources.find(_.alias.equalsIgnoreCase(t)) match {
        case Some(s) if s.has(c) => Right((s.alias, false))
        case Some(_) => Left(s"column '$t.$c' does not exist")
        case None => parent match {
          case Some(p) =>
            p.resolveQualified(t, c).map { case (a, _) => (a, true) }
          case None => Left(s"table '$t' is not in scope")
        }
      }
  }

  /** Does this expression reference the outer scope anywhere? */
  private def referencesOuter(e: Expr, scope: Scope): Boolean = e match {
    case Ident(n) => scope.resolve(n).exists(_._2)
    case QualifiedIdent(t, c) => scope.resolveQualified(t, c).exists(_._2)
    case Binary(_, l, r) =>
      referencesOuter(l, scope) || referencesOuter(r, scope)
    case Unary(_, x) => referencesOuter(x, scope)
    case FnCall(_, args) => args.exists(referencesOuter(_, scope))
    case Subquery(s) => // nested subquery: check its free refs one level up
      selectReferencesOuter(s, scope)
    case _ => false
  }

  /** Does this expression reference the scope's OWN sources anywhere? */
  private def referencesLocal(e: Expr, scope: Scope): Boolean = e match {
    case Ident(n) => scope.resolve(n).exists(!_._2)
    case QualifiedIdent(t, c) => scope.resolveQualified(t, c).exists(!_._2)
    case Binary(_, l, r) =>
      referencesLocal(l, scope) || referencesLocal(r, scope)
    case Unary(_, x) => referencesLocal(x, scope)
    case FnCall(_, args) => args.exists(referencesLocal(_, scope))
    case _ => false
  }

  /** All sources visible through the scope chain, inner-to-outer. */
  private def flattenSources(s: Scope): Seq[Source] =
    s.sources ++ s.parent.map(flattenSources).getOrElse(Nil)

  private def selectReferencesOuter(s: Select, outer: Scope): Boolean = {
    // conservative: any where/having/item referencing beyond s's own
    // sources AND beyond `outer`'s immediate sources counts
    val exprs = s.items.collect { case ExprItem(e, _) => e } ++
      s.where.toSeq ++ s.having.toSeq ++ s.groupBy
    exprs.exists(referencesOuter(_, outer))
  }

  private def containsAgg(e: Expr): Boolean = e match {
    case FnCall(n, _) if aggNames(n.toLowerCase) => true
    case CountAll => true
    case Binary(_, l, r) => containsAgg(l) || containsAgg(r)
    case Unary(_, x) => containsAgg(x)
    case FnCall(_, args) => args.exists(containsAgg)
    case _ => false
  }

  // ======================================================================
  // SELECT
  // ======================================================================

  def compileSelect(sel: Select): DataFrame = compileSelect(sel, None)

  private def compileSelect(sel: Select, parent: Option[Scope]): DataFrame = {
    var autoAlias = 0
    def refAlias(r: TableRef): String = r match {
      case NamedTable(name, a) => a.getOrElse(name)
      case DerivedTable(_, a) =>
        a.getOrElse { autoAlias += 1; s"__sub$autoAlias" }
    }
    def refFrame(r: TableRef, alias: String): DataFrame = r match {
      case NamedTable(name, _) => catalog.table(name).alias(alias)
      case DerivedTable(s, _)  => compileSelect(s, parent).alias(alias)
    }

    if (sel.from.isEmpty) { // SELECT <exprs>: one synthetic row
      return project(spark.range(1).drop("id"), sel, Scope(Nil, parent))
    }

    val fromAliases = sel.from.map(refAlias)
    val joinAliases = sel.joins.map(j => refAlias(j.table))
    val dupes = (fromAliases ++ joinAliases)
      .groupBy(_.toLowerCase).filter(_._2.size > 1).keys
    if (dupes.nonEmpty)
      throw CompileError(s"duplicate table alias '${dupes.head}'")

    // comma-list = cross join (reference nests scans with WHERE folded
    // innermost; Catalyst re-derives equi-joins from the filter)
    var df = refFrame(sel.from.head, fromAliases.head)
    var sources = Vector(Source(fromAliases.head, df.schema))
    sel.from.tail.zip(fromAliases.tail).foreach { case (r, a) =>
      val f = refFrame(r, a)
      sources = sources :+ Source(a, f.schema)
      df = df.crossJoin(f)
    }
    // explicit JOIN ... ON chains
    sel.joins.zip(joinAliases).foreach { case (j, a) =>
      val f = refFrame(j.table, a)
      val leftSources = sources
      sources = sources :+ Source(a, f.schema)
      val scope = Scope(sources, parent)
      // ON is an arbitrary expression in the reference
      // (`queryplan/mod.rs:563-572`), subqueries included. Scalar
      // subqueries bind onto the LEFT side before the join (uncorrelated
      // → broadcast one row; correlated on left columns → per-key join);
      // refs to the right-side table from inside the subquery error
      // cleanly since the binding scope excludes it.
      var dfL = df
      val on2 =
        if (exprHasSubquery(j.on)) {
          val (e2, d2) =
            bindSubqueries(j.on, dfL, Scope(leftSources, parent))
          dfL = d2; e2
        } else j.on
      // truthiness probe needs a frame with both sides
      val condT = compilePredicate(on2, scope, dfL.crossJoin(f))
      df = j.kind match {
        case InnerJoin => dfL.join(f, condT, "inner")
        case LeftJoin  => dfL.join(f, condT, "left_outer")
      }
    }

    val scope = Scope(sources, parent)

    sel.where.foreach { w =>
      val (w2, df2) = bindSubqueries(w, df, scope)
      df = df2.filter(compilePredicate(w2, scope, df2))
      df = dropHidden(df)
    }

    project(df, sel, scope)
  }

  /** SELECT list + GROUP BY/HAVING + ORDER BY/LIMIT over the source. */
  private def project(df0: DataFrame, sel: Select, scope: Scope)
      : DataFrame = {
    var df = df0
    val hasAgg = sel.groupBy.nonEmpty ||
      sel.items.exists { case ExprItem(e, _) => containsAgg(e)
                         case _ => false } ||
      sel.having.exists(containsAgg)

    val out: DataFrame = if (!hasAgg) {
      if (sel.having.nonEmpty)
        throw CompileError("HAVING requires aggregation or GROUP BY")
      // bind subqueries across all items first (each may augment df)
      val items2 = sel.items.map {
        case ExprItem(e, a) =>
          val (e2, df2) = bindSubqueries(e, df, scope)
          df = df2
          ExprItem(e2, a)
        case Wildcard => Wildcard
      }
      val cols = items2.zipWithIndex.flatMap {
        case (Wildcard, _) =>
          df.columns.toSeq.filterNot(_.startsWith("__sq"))
            .map(c => col(c))
        case (ExprItem(e, alias), i) =>
          Seq(compileExpr(e, scope, df).as(outName(e, alias, i)))
      }
      df.select(cols: _*)
    } else
      aggregatePath(df, sel, scope)

    // ---- DISTINCT / ORDER BY / LIMIT (beyond-reference; SURVEY §2.4) ---
    var result = if (sel.distinct) out.distinct() else out
    if (sel.orderBy.nonEmpty) {
      // sort expressions compile against the output frame; alias it so
      // scope-resolved "__out.col" references actually bind (bare idents
      // short-circuit, but ORDER BY v + w / ORDER BY -v go through the
      // compiler)
      val aliased = result.alias("__out")
      val outScope = Scope(Seq(Source("__out", result.schema)), None)
      val sorts = sel.orderBy.map { o =>
        val c = o.e match {
          case Ident(n) if result.columns.contains(n) => col(n)
          case _ => compileExpr(o.e, outScope, aliased)
        }
        if (o.desc) c.desc else c.asc
      }
      result = aliased.orderBy(sorts: _*)
    }
    sel.limit.foreach(n => result = result.limit(n.toInt))
    result
  }

  /** GROUP BY / whole-query aggregation (reference `TempGroupBy`,
    * `queryplan/mod.rs:364-444`): one HashAggregate with every aggregate
    * call + deterministic min() for bare columns, then output expressions
    * rebuilt over the aggregated frame. */
  private def aggregatePath(df0: DataFrame, sel: Select, scope: Scope)
      : DataFrame = {
    var df = df0

    // subqueries inside the agg path bind against the PRE-agg frame.
    // `*` under GROUP BY expands to every visible column, each resolved
    // as a bare column → "any row of the group" (reference
    // `execute/mod.rs:233-247` resolves them through the same bare-column
    // rule), which the deterministic min() path below implements.
    var items = sel.items.flatMap {
      case ExprItem(e, a) =>
        val (e2, df2) = bindSubqueries(e, df, scope); df = df2
        Seq(ExprItem(e2, a))
      case Wildcard =>
        scope.sources.flatMap(s => s.schema.fieldNames.toSeq
          .map(f => ExprItem(QualifiedIdent(s.alias, f), Some(f))))
    }
    var having = sel.having.map { h =>
      val (h2, df2) = bindSubqueries(h, df, scope); df = df2; h2
    }

    // 1. group keys as hidden columns
    val keyCols = sel.groupBy.zipWithIndex.map { case (e, i) => (e, s"__gk$i") }
    keyCols.foreach { case (e, n) =>
      df = df.withColumn(n, compileExpr(e, scope, df))
    }

    // 2. every aggregate call across SELECT + HAVING
    val aggCalls = scala.collection.mutable.LinkedHashMap[Expr, String]()
    def collect(e: Expr): Unit = e match {
      case f @ FnCall(n, _) if aggNames(n.toLowerCase) =>
        aggCalls.getOrElseUpdate(f, s"__agg${aggCalls.size}"); ()
      case CountAll =>
        aggCalls.getOrElseUpdate(CountAll, s"__agg${aggCalls.size}"); ()
      case Binary(_, l, r) => collect(l); collect(r)
      case Unary(_, x) => collect(x)
      case FnCall(_, args) => args.foreach(collect)
      case _ => ()
    }
    items.foreach(i => collect(i.e))
    having.foreach(collect)

    // 3. bare leaves outside aggregates → min() (reference "any row of
    //    the group", deterministic here)
    val bare = scala.collection.mutable.LinkedHashMap[Expr, String]()
    def collectBare(e: Expr): Unit = e match {
      case FnCall(n, _) if aggNames(n.toLowerCase) => ()
      case CountAll => ()
      case id: Ident if !id.name.startsWith("__") =>
        bare.getOrElseUpdate(id, s"__bare${bare.size}"); ()
      case id: Ident => // bound subquery value: aggregate with min too
        bare.getOrElseUpdate(id, s"__bare${bare.size}"); ()
      case q: QualifiedIdent =>
        bare.getOrElseUpdate(q, s"__bare${bare.size}"); ()
      case Binary(_, l, r) => collectBare(l); collectBare(r)
      case Unary(_, x) => collectBare(x)
      case FnCall(_, args) => args.foreach(collectBare)
      case _ => ()
    }
    items.foreach(i => if (!sel.groupBy.contains(i.e)) collectBare(i.e))
    having.foreach(h => if (!sel.groupBy.contains(h)) collectBare(h))

    // 4. one aggregation
    val aggExprs: Seq[Column] =
      aggCalls.map { case (e, n) =>
        compileAggCall(e, scope, df).as(n) }.toSeq ++
      bare.map { case (e, n) =>
        LlamaSem.bareColumn(compileExpr(e, scope, df)).as(n)
      }.toSeq
    val grouped =
      if (keyCols.nonEmpty) {
        val g = df.groupBy(keyCols.map(k => col(k._2)): _*)
        if (aggExprs.nonEmpty) g.agg(aggExprs.head, aggExprs.tail: _*)
        else g.agg(count(lit(1)).as("__unused"))
      } else {
        if (aggExprs.isEmpty)
          throw CompileError("aggregate query selects no expressions")
        df.agg(aggExprs.head, aggExprs.tail: _*)
      }

    // 5. rebuild output expressions over the aggregated frame
    def rewrite(e: Expr): Column = {
      keyCols.find(_._1 == e).foreach { case (_, n) => return col(n) }
      aggCalls.get(e).foreach(n => return col(n))
      bare.get(e).foreach(n => return col(n))
      e match {
        case Binary(op, l, r) => binary(op, rewrite(l), rewrite(r), grouped)
        case Unary("-", x) => -rewrite(x)
        case Unary(_, x) => rewrite(x)
        case StringLit(s) => lit(s)
        case NumberLit(t) => numberLit(t)
        case NullLit => lit(null)
        case other =>
          throw CompileError(s"cannot compile $other under GROUP BY")
      }
    }
    var res = grouped
    having.foreach { h =>
      // HAVING is a predicate site too: AND/OR operands get per-branch
      // truthiness like WHERE (the rewrite works over the agg frame)
      def predicate(e: Expr): Column = e match {
        case Binary("AND", l, r) => predicate(l) && predicate(r)
        case Binary("OR", l, r)  => predicate(l) || predicate(r)
        case Binary(op, _, _) if comparisonOps(op) => rewrite(e)
        case _ => truthyByProbe(rewrite(e), res)
      }
      res = res.filter(predicate(h))
    }
    res.select(items.zipWithIndex.map { case (ExprItem(e, a), i) =>
      rewrite(e).as(outName(e, a, i))
    }: _*)
  }

  // ======================================================================
  // scalar subqueries
  // ======================================================================

  private def exprHasSubquery(e: Expr): Boolean = e match {
    case Subquery(_) => true
    case Binary(_, l, r) => exprHasSubquery(l) || exprHasSubquery(r)
    case Unary(_, x) => exprHasSubquery(x)
    case FnCall(_, args) => args.exists(exprHasSubquery)
    case _ => false
  }

  private var sqCounter = 0
  private def freshSq(): String = { sqCounter += 1; s"__sq$sqCounter" }

  private def dropHidden(df: DataFrame): DataFrame = {
    val hidden = df.columns.filter(_.startsWith("__sq"))
    if (hidden.isEmpty) df else df.drop(hidden.toIndexedSeq: _*)
  }

  /** Replace every Subquery node in `e` with a hidden column bound onto
    * `df` (join/crossJoin), returning the rewritten expr + new frame.
    * This is the reference's `Map`-in-scalar-context (`execute/mod.rs:
    * 308-337`) as a set-based rewrite. */
  private def bindSubqueries(e: Expr, df: DataFrame, scope: Scope)
      : (Expr, DataFrame) = e match {
    case Subquery(s) =>
      val (name, df2) = bindOne(s, df, scope)
      (Ident(name), df2)
    case Binary(op, l, r) =>
      val (l2, d1) = bindSubqueries(l, df, scope)
      val (r2, d2) = bindSubqueries(r, d1, scope)
      (Binary(op, l2, r2), d2)
    case Unary(op, x) =>
      val (x2, d) = bindSubqueries(x, df, scope)
      (Unary(op, x2), d)
    case FnCall(n, args) =>
      var d = df
      val a2 = args.map { a =>
        val (x, dd) = bindSubqueries(a, d, scope); d = dd; x
      }
      (FnCall(n, a2), d)
    case other => (other, df)
  }

  /** Bind one scalar subquery onto the outer frame as a hidden column. */
  private def bindOne(sub: Select, outer: DataFrame, outerScope: Scope)
      : (String, DataFrame) = {
    if (sub.items.length != 1)
      throw CompileError("scalar subquery must select exactly one column")
    val name = freshSq()

    // Build the subquery's own scope over its FROM + JOIN chain, to
    // classify WHERE/ON conjuncts as local vs correlated. (The reference
    // compiles a nested SELECT including joins by recursing into the full
    // compiler, `queryplan/mod.rs:735-757`.)
    def asSource(r: TableRef): Source = r match {
      case NamedTable(n, a) =>
        Source(a.getOrElse(n), catalog.table(n).schema)
      case DerivedTable(s, a) =>
        Source(a.getOrElse("__sub"), compileSelect(s, None).schema)
    }
    val fromSources = sub.from.map(asSource)
    val joinSources = sub.joins.map(j => asSource(j.table))
    val subSources = fromSources ++ joinSources
    val subScope = Scope(subSources, Some(outerScope))

    val conjuncts = sub.where.map(splitAnd).getOrElse(Nil)
    val (correlated, local) =
      conjuncts.partition(referencesOuter(_, subScope))
    val onCorrelated = sub.joins.exists(j => referencesOuter(j.on, subScope))

    if (correlated.isEmpty && !onCorrelated) {
      // ---- uncorrelated: one global row, broadcast ----------------------
      val inner = compileSelect(sub, None)
      val v = inner.columns.head
      val isAggSub = sub.groupBy.isEmpty && sub.items.forall {
        case ExprItem(x, _) => containsAgg(x); case _ => false }
      val one =
        if (isAggSub) inner.select(col(v).as(name)) // agg → exactly 1 row
        else inner
          .agg(count(lit(1)).as("__n"), first(col(v)).as("__v"))
          .select(when(col("__n") === 1, col("__v"))
            .otherwise(raise_error(concat(
              lit("subquery must yield exactly one row (got "),
              col("__n").cast("string"), lit(")")))).as(name))
      (name, outer.crossJoin(broadcast(one)))
    } else {
      // The decorrelated rewrites model a plain per-outer-row SELECT —
      // reject subquery clauses they do not reproduce (an explicit
      // unsupported-feature error, not a silent wrong answer)
      if (sub.groupBy.nonEmpty || sub.having.nonEmpty ||
          sub.orderBy.nonEmpty || sub.limit.nonEmpty || sub.distinct)
        throw CompileError("GROUP BY/HAVING/ORDER BY/LIMIT/DISTINCT are " +
          "not supported in a correlated subquery")
      val valueExpr = sub.items.head.asInstanceOf[ExprItem].e
      val isAggSub = containsAgg(valueExpr)

      // fast path applies when every correlated conjunct is a clean
      // equality with one purely-inner and one purely-outer side, over a
      // single FROM table, and the selected value is inner-only
      val cleanPairs = correlated.map {
        case Binary("=", a, b) =>
          val aOut = referencesOuter(a, subScope)
          val bOut = referencesOuter(b, subScope)
          if (aOut && !referencesLocal(a, subScope) && !bOut)
            Some((b, a)) // (innerSide, outerSide)
          else if (bOut && !referencesLocal(b, subScope) && !aOut)
            Some((a, b))
          else None
        case _ => None
      }
      val fastEligible = cleanPairs.forall(_.isDefined) &&
        sub.from.length == 1 && sub.joins.isEmpty &&
        !referencesOuter(valueExpr, subScope)

      if (fastEligible) {
        // ---- equality correlation: decorrelate to a per-key join ------
        val pairs = cleanPairs.map(_.get)
        var inner = sub.from.head match {
          case NamedTable(n, a) => catalog.table(n).alias(a.getOrElse(n))
          case DerivedTable(s, a) =>
            compileSelect(s, None).alias(a.getOrElse("__sub"))
        }
        val innerScope = Scope(subSources, None) // no outer: local only
        local.foreach { p =>
          inner = inner.filter(compilePredicate(p, innerScope, inner))
        }

        val keyNames = pairs.zipWithIndex.map { case (_, i) => s"${name}_k$i" }
        pairs.zip(keyNames).foreach { case ((innerE, _), kn) =>
          inner = inner.withColumn(kn, compileExpr(innerE, innerScope, inner))
        }

        val perKey =
          if (isAggSub) {
            // aggregate subquery: one row per key by construction; empty
            // key-groups follow standard SQL via the join-miss below
            // (count → 0, others NULL) — documented deviation from the
            // reference's error-on-empty
            val aggCol = compileAggOverExpr(valueExpr, innerScope, inner)
            inner.groupBy(keyNames.map(col): _*)
              .agg(aggCol.as(s"${name}_v"), count(lit(1)).as(s"${name}_n"))
          } else {
            val v = compileExpr(valueExpr, innerScope, inner)
            inner.groupBy(keyNames.map(col): _*)
              .agg(first(v).as(s"${name}_v"), count(lit(1)).as(s"${name}_n"))
          }

        val joinCond = pairs.zip(keyNames).map { case ((_, outerE), kn) =>
          compileExpr(outerE, outerScope, outer) === col(kn)
        }.reduce(_ && _)

        val joined = outer.join(perKey, joinCond, "left_outer")
        val bound = joined
          .withColumn(name, subqueryValue(name, valueExpr, isAggSub))
          .drop((keyNames :+ s"${name}_v" :+ s"${name}_n").toIndexedSeq: _*)
        (name, bound)
      } else {
        // ---- general correlation (theta predicates, multi-FROM, outer
        // refs in the selected value): the reference's nested-loop Map
        // (`execute/mod.rs:308-337`) as a set-based rewrite. Match outer
        // rows to inner rows on the FULL correlated predicate, reduce
        // per outer row, join back by a synthetic outer-row id.
        // Catalyst still extracts any equality conjuncts as join keys,
        // so mixed equality+theta correlation plans a hash/merge join
        // with the theta part as residual condition — pure-theta falls
        // back to a nested-loop join, the reference's own cost shape.
        val outerAliases = flattenSources(outerScope)
          .map(_.alias.toLowerCase).toSet
        subSources.find(s => outerAliases(s.alias.toLowerCase)).foreach(s =>
          throw CompileError(s"correlated subquery reuses outer table " +
            s"alias '${s.alias}'; alias the subquery table"))

        val oid = s"${name}_oid"
        // the id is position-based, so it is only stable across the TWO
        // plan branches below (matches-join and the final join-back) if
        // both see one materialized assignment: eagerly checkpoint the
        // stamped frame. localCheckpoint over persist() for two reasons:
        // (1) lifecycle — persisted frames sit in the session's
        // CacheManager forever unless explicitly unpersisted (and the
        // statement's action happens after compilation returns, so there
        // is no safe unpersist point); a checkpointed RDD is freed by the
        // ContextCleaner as soon as the result frame is dropped. (2)
        // failure semantics — the truncated lineage means a lost block
        // fails the query loudly instead of silently recomputing with
        // different ids and misattaching subquery values to rows.
        val outerW = outer.withColumn(oid, monotonically_increasing_id())
          .localCheckpoint(true)

        def refFrame(r: TableRef, a: String): DataFrame = r match {
          case NamedTable(n, _) => catalog.table(n).alias(a)
          case DerivedTable(s, _) => compileSelect(s, None).alias(a)
        }
        var inner = sub.from.zip(fromSources.map(_.alias))
          .map { case (r, a) => refFrame(r, a) }.reduce(_ crossJoin _)
        // JOIN chain inside the subquery: an ON without outer refs joins
        // directly (scope = inner sources seen so far); an INNER join
        // whose ON references the outer scope is folded into the
        // correlated predicate via A JOIN B ON p ≡ A CROSS JOIN B
        // WHERE p — a LEFT join cannot be folded that way (null-padding
        // depends on p per outer row), so it errors explicitly.
        var extraCorrelated = List.empty[Expr]
        var seen = fromSources
        sub.joins.zip(joinSources).foreach { case (j, src) =>
          if (exprHasSubquery(j.on))
            throw CompileError("a subquery in JOIN ON inside a " +
              "correlated subquery is not supported")
          val f = refFrame(j.table, src.alias)
          seen = seen :+ src
          if (!referencesOuter(j.on, Scope(seen, Some(outerScope)))) {
            val localScope = Scope(seen, None)
            val cond = compilePredicate(j.on, localScope, inner.crossJoin(f))
            inner = j.kind match {
              case InnerJoin => inner.join(f, cond, "inner")
              case LeftJoin  => inner.join(f, cond, "left_outer")
            }
          } else j.kind match {
            case InnerJoin =>
              inner = inner.crossJoin(f)
              extraCorrelated ++= splitAnd(j.on)
            case LeftJoin => throw CompileError(
              "correlated ON in a LEFT JOIN inside a subquery is not supported")
          }
        }
        val innerScope = Scope(subSources, None)
        local.foreach { p =>
          inner = inner.filter(compilePredicate(p, innerScope, inner))
        }

        // joint scope: inner + all outer sources resolve as local
        val jointScope =
          Scope(subSources ++ flattenSources(outerScope), None)
        val probe = outerW.crossJoin(inner)
        val pred = (correlated ++ extraCorrelated)
          .map(p => compilePredicate(p, jointScope, probe))
          .reduce(_ && _)
        // Cost guardrail: this fallback is a faithful nested loop —
        // outer × inner pairs flow through the theta join, modeling the
        // reference's per-outer-row subquery re-execution. That is the
        // right semantics for the dialect but an unbounded cartesian if
        // a hostile query correlates two large relations, so the pair
        // volume is checked against spark.graft.decorrelate.maxPairs
        // and an over-cap query fails fast with a clear error instead
        // of occupying the cluster. The inner side is sized with a
        // LIMIT-bounded count, NOT a bare count(): a multi-FROM
        // subquery's `inner` is itself a cross join of its sources, so
        // `inner.count()` could execute the very runaway this guard
        // exists to prevent — the global limit makes Spark stop after
        // innerCap+1 rows (incremental partition execution), bounding
        // the probe itself. The equality fast path (the preferred
        // plan) is not affected. Default 1e10: codegen evaluates ~1e8
        // predicate-pairs/sec/core, so the cap bounds a worst-case
        // fallback to minutes on one executor — the q18 gate's
        // intended 6e8 pairs at sf0.1 pass with headroom, a runaway
        // cartesian (1e12+) fails in the compile step instead of days
        // into the job. The effective cap is width-scaled below: the
        // 1e10 calibration assumes ~64-byte probe rows, and a wide
        // schema trips proportionally earlier.
        val maxPairs = outerW.sparkSession.conf
          .get("spark.graft.decorrelate.maxPairs", "10000000000").toLong
        // Pair COUNT alone is a poor cost proxy across schemas: 1e10
        // two-int pairs and 1e10 thirty-column pairs differ ~100× in
        // the bytes the theta join must stream. Scale the effective cap
        // by the estimated probe-row width (outer + inner schema type
        // widths — Catalyst's own defaultSize per type, the same basis
        // its size-based join planning uses) against the 64-byte
        // reference width the default cap was calibrated on (q18's
        // probe row). Wider rows trip proportionally earlier; the cap
        // is never RAISED above the configured value for narrow rows
        // (conservative: the per-pair predicate evaluation cost floor
        // doesn't shrink with row width).
        val rowWidth = (outerW.schema ++ inner.schema)
          .map(_.dataType.defaultSize).sum
        val RefWidthBytes = 64.0
        val effMaxPairs = math.max(1L,
          (maxPairs / math.max(1.0, rowWidth / RefWidthBytes)).toLong)
        val nOuter = outerW.count()
        // reject iff nInner > perOuter (== pair volume > maxPairs). The
        // LIMIT needs one row of headroom to DETECT over-cap, and both
        // the +1 and the Int cast must saturate, not wrap: with
        // perOuter >= Int.MaxValue the probe can never observe an
        // over-cap count, so the guard correctly never fires (pair
        // volume <= nOuter * Int.MaxValue <= maxPairs), and a
        // maxPairs of Long.MaxValue must not overflow into a negative
        // limit.
        val perOuter = effMaxPairs / math.max(nOuter, 1L)
        val probeCap =
          (math.min(perOuter, Int.MaxValue.toLong - 1L) + 1L).toInt
        val nInner = inner.limit(probeCap).count()
        if (nOuter > 0 && nInner > perOuter)
          throw CompileError(
            s"correlated subquery requires a nested-loop over $nOuter x " +
            s">=$nInner rows of ~$rowWidth bytes, exceeding " +
            s"spark.graft.decorrelate.maxPairs=$maxPairs (width-scaled " +
            s"to $effMaxPairs pairs for this schema); add an equality " +
            "correlation or raise the cap")
        val matches = outerW.join(inner, pred, "inner")

        val perId =
          if (isAggSub)
            matches.groupBy(col(oid))
              .agg(compileAggOverExpr(valueExpr, jointScope, matches)
                     .as(s"${name}_v"),
                   count(lit(1)).as(s"${name}_n"))
          else
            matches.groupBy(col(oid))
              .agg(first(compileExpr(valueExpr, jointScope, matches))
                     .as(s"${name}_v"),
                   count(lit(1)).as(s"${name}_n"))

        val joined = outerW.join(perId, Seq(oid), "left_outer")
        val bound = joined
          .withColumn(name, subqueryValue(name, valueExpr, isAggSub))
          .drop(oid, s"${name}_v", s"${name}_n")
        (name, bound)
      }
    }
  }

  /** The bound subquery value over a (…_v, …_n) join result: aggregate
    * subqueries follow standard SQL on the join miss (count → 0, others
    * NULL); non-aggregate subqueries enforce the reference's
    * exactly-one-row rule with a runtime error. */
  private def subqueryValue(name: String, valueExpr: Expr,
                            isAggSub: Boolean): Column =
    if (isAggSub)
      valueExpr match {
        case FnCall(n, _) if n.toLowerCase == "count" =>
          coalesce(col(s"${name}_v"), lit(0L))
        case CountAll => coalesce(col(s"${name}_v"), lit(0L))
        case _ => col(s"${name}_v")
      }
    else
      when(col(s"${name}_n").isNull, raise_error(
        lit("subquery must yield exactly one row (got 0)")))
      .when(col(s"${name}_n") > 1, raise_error(concat(
        lit("subquery must yield exactly one row (got "),
        col(s"${name}_n").cast("string"), lit(")"))))
      .otherwise(col(s"${name}_v"))

  /** Compile an expression that is a single aggregate call (possibly
    * wrapped in arithmetic) for a correlated aggregate subquery. */
  private def compileAggOverExpr(e: Expr, scope: Scope,
                                 probe: DataFrame): Column = e match {
    case f @ FnCall(n, _) if aggNames(n.toLowerCase) =>
      compileAggCall(f, scope, probe)
    case CountAll => count(lit(1))
    case Binary(op, l, r) =>
      binary(op, compileAggOverExpr(l, scope, probe),
             compileAggOverExpr(r, scope, probe), probe)
    case Unary("-", x) => -compileAggOverExpr(x, scope, probe)
    case StringLit(s) => lit(s)
    case NumberLit(t) => numberLit(t)
    case NullLit => lit(null)
    // bare column in aggregate context → deterministic any-row (min),
    // the same rule as bare columns under GROUP BY; covers correlated
    // outer refs in the value expr, which are constant per group
    case id: Ident => LlamaSem.bareColumn(compileExpr(id, scope, probe))
    case q: QualifiedIdent => LlamaSem.bareColumn(compileExpr(q, scope, probe))
    case other => throw CompileError(
      s"unsupported expression in aggregate subquery: $other")
  }

  private def splitAnd(e: Expr): Seq[Expr] = e match {
    case Binary("AND", l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  // ======================================================================
  // expressions
  // ======================================================================

  private def outName(e: Expr, alias: Option[String], i: Int): String =
    alias.getOrElse(e match {
      case Ident(n) => n
      case QualifiedIdent(_, c) => c
      case _ => s"_c$i"
    })

  /** Reference literal typing: i64 first, f64 if dotted (variant.rs:46-56;
    * u64 overflow territory → decimal, SURVEY §7.3). */
  private def numberLit(text: String): Column =
    if (text.contains('.')) lit(text.toDouble)
    else try lit(text.toLong) catch {
      case _: NumberFormatException => lit(BigDecimal(text))
    }

  private val integralTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  private def binary(op: String, l: Column, r: Column,
                     probe: DataFrame): Column = op match {
    case "="  => l === r
    case "<>" => l =!= r
    case "<"  => l < r
    case "<=" => l <= r
    case ">"  => l > r
    case ">=" => l >= r
    case "AND" => l && r
    case "OR"  => l || r
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" =>
      // reference `/` divides in the lhs's type: integral inputs use
      // truncating integer division (variant.rs:294-383); div-by-zero →
      // NULL (§1.5.5). Spark's `/` is always fractional, so probe types.
      val Seq(lt, rt) = probe.select(l.as("__l"), r.as("__r"))
        .schema.map(_.dataType).toSeq
      if (integralTypes(lt) && integralTypes(rt))
        when(r === 0, lit(null)).otherwise(call_function("div", l, r))
      else LlamaSem.safeDiv(l, r)
    case "||" => LlamaSem.concatSem(l, r)  // display-form concat (§1.5.7)
    case "&" => l.bitwiseAND(r)
    case "|" => l.bitwiseOR(r)
    case other => throw CompileError(s"unknown operator '$other'")
  }

  /** Compile an expression to a Column. Subqueries must already be bound
    * (bindSubqueries) — hidden `__sq*` idents compile to direct refs. */
  private def compileExpr(e: Expr, scope: Scope,
                          probe: DataFrame): Column = e match {
    case StringLit(s) => lit(s)
    case NumberLit(t) => numberLit(t)
    case NullLit      => lit(null)
    case Ident(name) if name.startsWith("__sq") => col(name)
    case Ident(name) =>
      scope.resolve(name) match {
        case Right((alias, false)) => col(s"$alias.$name")
        case Right((_, true)) => throw CompileError(
          s"correlated reference '$name' outside a supported position")
        case Left(msg) => throw CompileError(msg)
      }
    case QualifiedIdent(t, c) =>
      scope.resolveQualified(t, c) match {
        case Right((alias, false)) => col(s"$alias.$c")
        case Right((_, true)) => throw CompileError(
          s"correlated reference '$t.$c' outside a supported position")
        case Left(msg) => throw CompileError(msg)
      }
    case Unary("-", x) => -compileExpr(x, scope, probe)
    case Unary(_, x)   => compileExpr(x, scope, probe)
    case Binary(op, l, r) =>
      binary(op, compileExpr(l, scope, probe),
             compileExpr(r, scope, probe), probe)
    case Subquery(_) =>
      throw CompileError("internal: unbound scalar subquery")
    case CountAll =>
      throw CompileError("count(*) is only valid with GROUP BY/aggregation")
    case FnCall(name, _) if aggNames(name.toLowerCase) =>
      throw CompileError(
        s"aggregate '$name' not allowed here (no aggregation context)")
    case FnCall(name, _) =>
      // the reference has NO scalar functions (`queryplan/mod.rs:795-801`)
      throw CompileError(s"unknown function name '$name'")
  }

  /** One aggregate call (`aggregate.rs`: sum as f64, NULLs skipped,
    * exactly one argument). */
  private def compileAggCall(e: Expr, scope: Scope,
                             probe: DataFrame): Column = e match {
    case CountAll => count(lit(1))
    case FnCall(name, args) =>
      if (args.length != 1)
        throw CompileError(s"aggregate '$name' takes exactly one argument")
      val arg = compileExpr(args.head, scope, probe)
      name.toLowerCase match {
        case "count" => count(arg)
        case "sum"   => LlamaSem.llamaSum(arg)
        case "avg"   => avg(arg)
        case "min"   => min(arg)
        case "max"   => max(arg)
        case other   => throw CompileError(s"unknown aggregate '$other'")
      }
    case other => throw CompileError(s"not an aggregate: $other")
  }

  // ---- truthiness -------------------------------------------------------

  /** Compile a scalar expression against one aliased table frame (the
    * UPDATE SET / UPDATE-DELETE WHERE position; subqueries disallowed —
    * the reference has no UPDATE/DELETE execution at all, SURVEY §2.4). */
  def compileOnTable(table: String, df: DataFrame, e: Expr): Column = {
    if (exprHasSubquery(e))
      throw CompileError("subqueries are not supported in UPDATE/DELETE")
    compileExpr(e, Scope(Seq(Source(table, df.schema)), None), df)
  }

  /** Same, but wrapped in predicate truthiness (WHERE position). */
  def compilePredicateOnTable(table: String, df: DataFrame, e: Expr): Column = {
    if (exprHasSubquery(e))
      throw CompileError("subqueries are not supported in UPDATE/DELETE")
    compilePredicate(e, Scope(Seq(Source(table, df.schema)), None), df)
  }

  private val comparisonOps = Set("=", "<>", "<", "<=", ">", ">=")

  /** Compile an expression in predicate position. The reference's And/Or
    * run `tests_true` on EACH operand (`columnvalueops.rs:95-109`), so
    * `WHERE x AND name` with an integer x and a string name works —
    * recurse through AND/OR wrapping every non-boolean branch, leave
    * comparisons (already boolean) untouched. */
  private def compilePredicate(e: Expr, scope: Scope,
                               probe: DataFrame): Column = e match {
    case Binary("AND", l, r) =>
      compilePredicate(l, scope, probe) && compilePredicate(r, scope, probe)
    case Binary("OR", l, r) =>
      compilePredicate(l, scope, probe) || compilePredicate(r, scope, probe)
    case Binary(op, _, _) if comparisonOps(op) =>
      compileExpr(e, scope, probe)
    case _ => truthyByProbe(compileExpr(e, scope, probe), probe)
  }

  /** Resolve the expression's type with a schema probe, then wrap
    * (`tests_true()`, variant.rs:171-182). The probe is compile-time
    * only — no job runs. */
  private def truthyByProbe(c: Column, df: DataFrame): Column = {
    val dt = df.select(c.as("__probe")).schema.head.dataType
    LlamaSem.truthyTyped(c, dt)
  }

  // ======================================================================
  // INSERT value evaluation (expressions incl. uncorrelated subqueries,
  // reference `tempdb/mod.rs:247-263`)
  // ======================================================================

  /** Evaluate INSERT VALUES expressions. Literal rows are inherently
    * driver-sized; each row's expressions are compiled against a 1-row
    * frame (subqueries bind onto it) and collected. */
  def evalValues(rows: Seq[Seq[Expr]]): Seq[Seq[Any]] = rows.map { vals =>
    // Fast path: literal-only rows evaluate on the driver directly — a
    // bulk INSERT script would otherwise run one Spark job per row
    // (3,500 jobs ≈ minutes for the reference's own testdata script).
    val fast = vals.map(evalLiteral)
    if (fast.forall(_.isDefined)) fast.map(_.get)
    else {
      // general path (subqueries, arithmetic over subqueries, ...):
      // compile against a one-row frame and run the job.
      var df = spark.range(1).drop("id")
      val scope = Scope(Nil, None)
      val cols = vals.zipWithIndex.map { case (e, i) =>
        val (e2, df2) = bindSubqueries(e, df, scope)
        df = df2
        compileExpr(e2, scope, df).as(s"_v$i")
      }
      val row = df.select(cols: _*).collect().head
      row.toSeq
    }
  }

  /** Driver-side value of a literal-only expression (None = not literal).
    * Number typing mirrors `numberLit`: integral → Long (Decimal beyond
    * i64 range), else Double — same values the Spark path produces. */
  private def evalLiteral(e: Expr): Option[Any] = e match {
    case StringLit(s) => Some(s)
    case NullLit      => Some(null)
    case NumberLit(t) =>
      if (t.contains('.')) Some(t.toDouble)
      else try Some(t.toLong) catch {
        case _: NumberFormatException => Some(BigDecimal(t))
      }
    case Unary("-", x) => evalLiteral(x).flatMap {
      case l: Long   => Some(-l)
      case d: Double => Some(-d)
      case b: BigDecimal => Some(-b)
      case _ => None // -'string' etc: let the Spark path error consistently
    }
    case Unary("+", x) => evalLiteral(x)
    case _ => None
  }
}
