package graft.explain

import graft.sqlfront.Ast._

/** EXPLAIN renderer: the llamadb-style s-expression view of a SELECT
  * (reference prints its IR verbatim — `sexpression.rs:83-186`, sample
  * output `Usage.md:145-167`). We render the *logical* pipeline our
  * compiler assembles; Engine.explain appends Spark's optimized physical
  * plan, which is the honest answer to "what actually runs".
  *
  * Numeric fidelity: like the reference's `new_source_id()` counter,
  * every FROM/JOIN source gets an integer `:source-id` in scan order,
  * a grouped query gets a fresh id for the group source, and column
  * references render as `(column-field :source-id N :column-offset M)`
  * when the column resolves against a known table schema (callers pass
  * the catalog's schema lookup); unresolvable names — e.g. output
  * aliases — fall back to the backtick form.
  */
object Explain {

  /** One visible source while rendering: alias → (id, column names). */
  private case class Src(alias: String, id: Int, cols: Seq[String])

  def render(sel: Select,
             schemaOf: String => Option[Seq[String]] = _ => None): String = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val sb = new StringBuilder
    sb.append("(query\n")
    renderSelect(sel, sb, 1, counter, schemaOf)
    sb.append(")")
    sb.toString
  }

  private def ind(n: Int) = "  " * n

  private def renderSelect(sel: Select, sb: StringBuilder, d: Int,
                           counter: java.util.concurrent.atomic.AtomicInteger,
                           schemaOf: String => Option[Seq[String]]): Unit = {
    // FROM structure: nested scans, reference-style, ids in scan order
    val named: Seq[(String, String, Boolean)] = sel.from.map {
      case NamedTable(n, a) => (n, a.getOrElse(n), false)
      case DerivedTable(_, a) => ("<subquery>", a.getOrElse("?"), false)
    } ++ sel.joins.map { j =>
      j.table match {
        case NamedTable(n, a) => (n, a.getOrElse(n), j.kind == LeftJoin)
        case DerivedTable(_, a) => ("<subquery>", a.getOrElse("?"), false)
      }
    }
    val srcs = named.map { case (t, a, _) =>
      Src(a, counter.getAndIncrement(), schemaOf(t).getOrElse(Nil))
    }
    named.zip(srcs).foreach { case ((t, _, isLeft), s) =>
      val kind = if (isLeft) "left-join " else ""
      sb.append(ind(d)).append(s"(scan `$t` $kind:source-id ${s.id}\n")
    }
    def ex(e: Expr): String = renderExpr(e, srcs, counter, schemaOf)
    sel.where.foreach { w =>
      sb.append(ind(d + 1)).append(s"(if ${ex(w)}\n")
    }
    val grouped = sel.groupBy.nonEmpty || sel.having.nonEmpty
    if (grouped) {
      // the group is itself a source in the reference IR — fresh id
      val gid = counter.getAndIncrement()
      sb.append(ind(d + 1))
        .append(s"(temp-group-by :source-id $gid :keys " +
                s"(${sel.groupBy.map(ex).mkString(" ")})\n")
    }
    sel.having.foreach { h =>
      sb.append(ind(d + 2)).append(s"(if ${ex(h)}\n")
    }
    sb.append(ind(d + 2)).append("(yield")
    sel.items.foreach {
      case Wildcard => sb.append(" *")
      case ExprItem(e, alias) =>
        sb.append(" ").append(ex(e))
        alias.foreach(a => sb.append(s" :as $a"))
    }
    sb.append(")")
    sel.having.foreach(_ => sb.append(")"))
    if (grouped) sb.append(")")
    sel.where.foreach(_ => sb.append(")"))
    srcs.foreach(_ => sb.append(")"))
    sb.append("\n")
    if (sel.orderBy.nonEmpty)
      sb.append(ind(d)).append(
        s"(order-by ${sel.orderBy.map(o =>
          ex(o.e) + (if (o.desc) " :desc" else "")).mkString(" ")})\n")
    sel.limit.foreach(n => sb.append(ind(d)).append(s"(limit $n)\n"))
  }

  /** Back-compat: render an expression with no source resolution. */
  def renderExpr(e: Expr): String =
    renderExpr(e, Nil, new java.util.concurrent.atomic.AtomicInteger(0),
               _ => None)

  private def renderExpr(e: Expr, srcs: Seq[Src],
                         counter: java.util.concurrent.atomic.AtomicInteger,
                         schemaOf: String => Option[Seq[String]]): String = {
    def field(alias: Option[String], col: String): Option[String] = {
      val hits = alias match {
        case Some(a) => srcs.filter(_.alias.equalsIgnoreCase(a))
        case None => srcs.filter(_.cols.exists(_.equalsIgnoreCase(col)))
      }
      hits match {
        case Seq(s) =>
          val off = s.cols.indexWhere(_.equalsIgnoreCase(col))
          if (off >= 0)
            Some(s"(column-field :source-id ${s.id} :column-offset $off)")
          else None
        case _ => None
      }
    }
    e match {
      case Ident(n) => field(None, n).getOrElse(s"`$n`")
      case QualifiedIdent(t, c) => field(Some(t), c).getOrElse(s"`$t`.`$c`")
      case StringLit(s) => s"'${s}'"
      case NumberLit(t) => t
      case NullLit => "null"
      case CountAll => "(count-all)"
      case FnCall(n, args) =>
        s"($n ${args.map(renderExpr(_, srcs, counter, schemaOf)).mkString(" ")})"
      case Unary(op, x) => s"($op ${renderExpr(x, srcs, counter, schemaOf)})"
      case Binary(op, l, r) =>
        s"(${op.toLowerCase} ${renderExpr(l, srcs, counter, schemaOf)} " +
        s"${renderExpr(r, srcs, counter, schemaOf)})"
      case Subquery(s) =>
        // nested map keeps numbering from the same counter, like the
        // reference's shared source-id scope chain
        val sb = new StringBuilder
        sb.append("(map ")
        renderSelect(s, sb, 0, counter, schemaOf)
        sb.append(")")
        sb.toString.replaceAll("\\s+", " ")
    }
  }
}
