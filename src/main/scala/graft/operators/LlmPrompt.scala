package graft.operators

import graft.core.Panel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LLM panel-analysis prompt assembly — the deterministic data side of
  * the reference's `llm` namespace (llm/api.py:38-76 `analyze`,
  * llm/formatting.py): filter the panel to a basket of entities, pivot
  * long→wide (sorted entity columns), render a markdown table, and
  * wrap it in the fixed task/context/constraints/format template. The
  * `openai_call` itself (llm/common.py) is an external-service egress
  * boundary — stubbed by policy, exactly like the multimodal decoders;
  * a caller sends the returned prompt through whatever gateway they
  * have.
  *
  * Scale shape: one filter (basket pushdown to the scan) + one
  * groupBy(time) shuffle over basket rows only; the basket is a
  * human-readable prompt's worth of entities (a handful), so the wide
  * row strings are tiny and the final single-row concat is a
  * two-level aggregation, not a driver collect of the panel.
  */
object LlmPrompt {

  private val Constraints =
    " Be specific and respond with non-obvious statistical analyses in the tone of a McKinsey consultant." +
      " Describe trend, seasonality, and anomalies. Do not provide recommendations. Do not describe the table." +
      " Do not introduce yourself or your role."

  /** (task, formatting) per llm/formatting.py:25-35. */
  private def instructions(format: String): (String, String) = format match {
    case "markdown_bullet_list" =>
      ("Analyze the following time series data in 8-10 bulletpoints.",
        "{{ Insert unordered Markdown list here }}")
    case "freeform" =>
      ("Analyze the following time series data.", "{{ Insert your response here }}")
    case other => throw new IllegalArgumentException(s"Invalid formatting option: $other")
  }

  /** Single-row DataFrame (column `__b`) holding the rendered markdown
    * table (header + time-sorted rows) for one basket of entities. Wide
    * pivot with explicit sorted columns (api.py:27-36 sorts the pivoted
    * entity columns); duplicate timestamps collapse by string max on
    * both engines, deterministically. */
  private def basketTable(p: Panel, timeCol: String, basket: Seq[Long]): DataFrame = {
    val ents = basket.sorted
    val entity = p.entity.head
    val header = s"| $timeCol | " + ents.mkString(" | ") + " |"
    val filtered = p.df.filter(col(entity).isin(ents: _*))
    val cells = ents.map { e =>
      max(when(col(entity) === e,
        format_string("%.6f", graft.queries.Q.rd6(p.x)))).as(s"__c$e")
    }
    val wide = filtered.groupBy(col(timeCol)).agg(cells.head, cells.tail: _*)
    val rowStr = concat(
      (lit("| ") +: date_format(col(timeCol), "yyyy-MM-dd HH:mm:ss") +:
        ents.flatMap(e => Seq(lit(" | "), coalesce(col(s"__c$e"), lit("")))) :+
        lit(" |")): _*)
    wide.select(col(timeCol), rowStr.as("__r"))
      .agg(concat_ws("\n",
        sort_array(collect_list(struct(col(timeCol), col("__r")))).getField("__r")).as("__b"))
      .select(concat(lit(header + "\n"), col("__b")).as("__b"))
  }

  /** Single-row DataFrame (`prompt`) with the exact analyze() prompt.
    * Cell floats render as %.6f of the rd6-rounded value so the DuckDB
    * oracle (printf over round(v, 6)) byte-matches. */
  def analyzePrompt(p: Panel, timeCol: String, basket: Seq[Long],
                    context: String, format: String = "markdown_bullet_list"): DataFrame = {
    require(basket.nonEmpty, "basket must name at least one entity")
    val (task, formatting) = instructions(format)
    basketTable(p, timeCol, basket).select(concat(
      lit(task),
      lit(s" The context is: $context."),
      lit(Constraints),
      lit("\n\n```\n"),
      col("__b"),
      lit("\n```\n\n" + formatting)).as("prompt"))
  }

  /** Single-row DataFrame (`prompt`) with the exact compare() prompt —
    * llm/api.py:65-103: two baskets pivoted independently, rendered as
    * "### This" / "### Other" tables inside one code fence
    * (formatting.py:11-22's Mapping branch), comparison task/context/
    * constraints template. */
  def comparePrompt(p: Panel, timeCol: String, basket: Seq[Long],
                    otherBasket: Seq[Long],
                    targetFeature: Option[String] = None): DataFrame = {
    require(basket.nonEmpty && otherBasket.nonEmpty,
      "both baskets must name at least one entity")
    val task = "Compare and contrast the following time series data."
    val context = targetFeature match {
      case Some(t) => s" Compare the dataframe entities against the target feature `$t`."
      case None    => " Compare the dataframe entities against each other."
    }
    val constraints =
      " Be specific and respond with non-obvious statistical analyses in the tone of a McKinsey consultant." +
        " Compare trend, seasonality, and anomalies. Do not provide recommendations. Do not describe the tables." +
        " Do not introduce yourself or your role."
    val thisT = basketTable(p, timeCol, basket).select(col("__b").as("__b1"))
    val otherT = basketTable(p, timeCol, otherBasket).select(col("__b").as("__b2"))
    // two single-row frames — the cross join is a 1×1 concat, not a blowup
    thisT.crossJoin(otherT).select(concat(
      lit(task),
      lit(context),
      lit(constraints),
      lit("\n\n```\n### This\n"),
      col("__b1"),
      lit("\n\n### Other\n"),
      col("__b2"),
      lit("\n```\n\n{{ Insert your comparative analysis here }}")).as("prompt"))
  }
}
