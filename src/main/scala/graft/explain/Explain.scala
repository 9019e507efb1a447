package graft.explain

import graft.sqlfront.Ast._

/** EXPLAIN renderer: the llamadb-style s-expression view of a SELECT
  * (reference prints its IR verbatim — `sexpression.rs:83-186`, sample
  * output `Usage.md:145-167`). We render the *logical* pipeline our
  * compiler assembles; Engine.explain appends Spark's optimized physical
  * plan, which is the honest answer to "what actually runs".
  */
object Explain {

  def render(sel: Select): String = {
    val sb = new StringBuilder
    sb.append("(query\n")
    renderSelect(sel, sb, 1)
    sb.append(")")
    sb.toString
  }

  private def ind(n: Int) = "  " * n

  private def renderSelect(sel: Select, sb: StringBuilder, d: Int): Unit = {
    // FROM structure: nested scans, reference-style
    val sources: Seq[(String, String)] = sel.from.map {
      case NamedTable(n, a) => (n, a.getOrElse(n))
      case DerivedTable(_, a) => ("<subquery>", a.getOrElse("?"))
    } ++ sel.joins.map { j =>
      j.table match {
        case NamedTable(n, a) =>
          (s"$n ${if (j.kind == LeftJoin) "left-join" else "join"}",
           a.getOrElse(n))
        case DerivedTable(_, a) => ("<subquery> join", a.getOrElse("?"))
      }
    }
    sources.foreach { case (t, a) =>
      sb.append(ind(d)).append(s"(scan `$t` :source-id $a\n")
    }
    sel.where.foreach { w =>
      sb.append(ind(d + 1)).append(s"(if ${renderExpr(w)}\n")
    }
    if (sel.groupBy.nonEmpty || sel.having.nonEmpty) {
      sb.append(ind(d + 1))
        .append(s"(temp-group-by :keys (${sel.groupBy.map(renderExpr).mkString(" ")})\n")
    }
    sel.having.foreach { h =>
      sb.append(ind(d + 2)).append(s"(if ${renderExpr(h)}\n")
    }
    sb.append(ind(d + 2)).append("(yield")
    sel.items.foreach {
      case Wildcard => sb.append(" *")
      case ExprItem(e, alias) =>
        sb.append(" ").append(renderExpr(e))
        alias.foreach(a => sb.append(s" :as $a"))
    }
    sb.append(")")
    sel.having.foreach(_ => sb.append(")"))
    if (sel.groupBy.nonEmpty || sel.having.nonEmpty) sb.append(")")
    sel.where.foreach(_ => sb.append(")"))
    sources.foreach(_ => sb.append(")"))
    sb.append("\n")
    if (sel.orderBy.nonEmpty)
      sb.append(ind(d)).append(
        s"(order-by ${sel.orderBy.map(o =>
          renderExpr(o.e) + (if (o.desc) " :desc" else "")).mkString(" ")})\n")
    sel.limit.foreach(n => sb.append(ind(d)).append(s"(limit $n)\n"))
  }

  def renderExpr(e: Expr): String = e match {
    case Ident(n) => s"`$n`"
    case QualifiedIdent(t, c) => s"`$t`.`$c`"
    case StringLit(s) => s"'${s}'"
    case NumberLit(t) => t
    case NullLit => "null"
    case CountAll => "(count-all)"
    case FnCall(n, args) => s"($n ${args.map(renderExpr).mkString(" ")})"
    case Unary(op, x) => s"($op ${renderExpr(x)})"
    case Binary(op, l, r) =>
      s"(${op.toLowerCase} ${renderExpr(l)} ${renderExpr(r)})"
    case Subquery(s) => "(map " + render(s).replaceAll("\\s+", " ") + ")"
  }
}
