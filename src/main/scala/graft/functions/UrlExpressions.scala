package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.url.UrlKit

/** Native Catalyst expressions (with codegen) for the hottest per-link
  * scalar path: URL canonicalization + admission. At 10^10-link scale the
  * admission function runs once per extracted link; a ScalaUDF pays
  * encoder round-trips and breaks whole-stage codegen around the call,
  * while these expressions stay inside the generated code and call one
  * static method (SURVEY §4: "custom expressions — promote selectively").
  *
  * Registered as SQL functions (`url_admit`, `url_domain_only`,
  * `url_is_web_link`) via [[GraftFunctions.register]] on any session, or
  * through `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object UrlEval {
  // static targets for generated code — one UTF8String in/out, no boxing
  def admitOrNull(u: UTF8String): UTF8String = {
    if (u == null) return null
    UrlKit.cleanedLink(u.toString) match {
      case Some(clean) if clean.nonEmpty && UrlKit.isWebLink(clean) &&
          !UrlKit.isAnalytics(clean) && !UrlKit.isLinkService(clean) =>
        UTF8String.fromString(clean)
      case _ => null
    }
  }

  def domainOnlyOrNull(u: UTF8String): UTF8String = {
    if (u == null) return null
    UrlKit.domainOnly(u.toString)
      .map(UTF8String.fromString).orNull
  }

  def isWebLink(u: UTF8String): Boolean =
    u != null && UrlKit.isWebLink(u.toString)
}

/** `url_admit(link)`: canonical URL when the link passes admission
  * (P9 ∧ P3 ∧ ¬P13 ∧ ¬P14), else NULL — the frontier admission filter
  * fused into one call. */
case class UrlAdmit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    UrlEval.admitOrNull(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlEval.admitOrNull($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): UrlAdmit =
    copy(child = newChild)
  override def prettyName: String = "url_admit"
}

/** `url_domain_only(url)`: lowercase host without port/www/user@ (P2). */
case class UrlDomainOnly(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    UrlEval.domainOnlyOrNull(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlEval.domainOnlyOrNull($c);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildInternal(newChild: Expression): UrlDomainOnly =
    copy(child = newChild)
  override def prettyName: String = "url_domain_only"
}

/** `url_is_web_link(url)`: the P3 admission predicate. Genuinely
  * non-nullable: a NULL url is not a web link, so the expression returns
  * false for null input instead of propagating null — which is what lets
  * `nullable = false` be declared safely (Catalyst may constant-fold
  * IsNotNull around it). */
case class UrlIsWebLink(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && UrlEval.isWebLink(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} =
          !${c.isNull} && graft.functions.UrlEval.isWebLink(${c.value});""",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): UrlIsWebLink =
    copy(child = newChild)
  override def prettyName: String = "url_is_web_link"
}

object GraftFunctions {

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("url_admit", "canonicalize a link and NULL it unless it passes " +
      "frontier admission (is_web_link, not analytics, not a link service)",
      cs => UrlAdmit(cs.head)),
    ("url_domain_only", "lowercase registrable host of a URL",
      cs => UrlDomainOnly(cs.head)),
    ("url_is_web_link", "true when the string is a crawlable web link",
      cs => UrlIsWebLink(cs.head)))

  /** Runtime registration on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = all.foreach {
    case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.UrlExpressions", name),
        builder)
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — injects the
  * URL functions at session build time (SparkSessionExtensions API). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.UrlExpressions", name),
        builder))
    }
}
