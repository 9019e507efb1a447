package graft.sqlfront

/** AST for the llamadb SQL dialect (reference grammar:
  * `src/sqlsyntax/ast.rs`, parser `src/sqlsyntax/parser/mod.rs`).
  * Built fresh for Spark compilation — expressions carry no types;
  * resolution happens against DataFrame schemas at compile time.
  */
object Ast {

  // ---- expressions ----------------------------------------------------

  sealed trait Expr
  case class Ident(name: String)                       extends Expr
  case class QualifiedIdent(table: String, column: String) extends Expr
  case class StringLit(value: String)                  extends Expr
  case class NumberLit(text: String)                   extends Expr
  case object NullLit                                  extends Expr
  case class Subquery(select: Select)                  extends Expr
  case class FnCall(name: String, args: Seq[Expr])     extends Expr
  case object CountAll                                 extends Expr // count(*)
  case class Unary(op: String, e: Expr)                extends Expr // "-" | "+"
  case class Binary(op: String, l: Expr, r: Expr)      extends Expr
  // op ∈ = <> < <= > >= AND OR + - * / || & |

  // ---- SELECT ---------------------------------------------------------

  sealed trait SelectItem
  case object Wildcard                                  extends SelectItem
  case class ExprItem(e: Expr, alias: Option[String])   extends SelectItem

  sealed trait TableRef { def alias: Option[String] }
  case class NamedTable(name: String, alias: Option[String]) extends TableRef
  case class DerivedTable(select: Select, alias: Option[String]) extends TableRef

  sealed trait JoinKind
  case object InnerJoin extends JoinKind
  case object LeftJoin  extends JoinKind

  case class Join(kind: JoinKind, table: TableRef, on: Expr)

  case class OrderItem(e: Expr, desc: Boolean)

  case class Select(
    items: Seq[SelectItem],
    from: Seq[TableRef],          // comma list = cross join
    joins: Seq[Join],             // explicit JOIN ... ON chains
    where: Option[Expr],
    groupBy: Seq[Expr],
    having: Option[Expr],
    orderBy: Seq[OrderItem],      // beyond-reference (parsed there, unimpl)
    limit: Option[Long],          // beyond-reference
    distinct: Boolean = false)    // beyond-reference (token-only there)

  // ---- other statements ------------------------------------------------

  case class ColumnDef(name: String, typeName: String,
                       nullable: Boolean) // NULL constraint = opt-in nullable

  sealed trait Statement
  case class SelectStmt(s: Select)                       extends Statement
  case class CreateTable(name: String, cols: Seq[ColumnDef]) extends Statement
  case class InsertValues(table: String, columns: Seq[String],
                          rows: Seq[Seq[Expr]])          extends Statement
  case class InsertSelect(table: String, columns: Seq[String],
                          select: Select)                extends Statement
  case class Explain(s: Select)                          extends Statement
  // beyond-reference DML (UPDATE/DELETE are lexer tokens only there,
  // `lexer.rs:6-16`; SURVEY §2.4)
  case class Update(table: String, sets: Seq[(String, Expr)],
                    where: Option[Expr])                 extends Statement
  case class Delete(table: String, where: Option[Expr]) extends Statement
}
