package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT / chat-training conversation assembly (reference scope: the
  * reference's `ops` row surface stops at flat records — this module is
  * part of the SURVEY §2.12 LLM-pipeline extension surface).
  *
  * A fine-tuning corpus arrives as one row per TURN
  * `(conversation, order…, role, content)` and must leave as one row per
  * TRAINING EXAMPLE: the turns in order, rendered through a chat template,
  * with the character spans the loss is computed over (assistant turns
  * only) and a token budget enforced by dropping whole leading turns —
  * never by cutting a turn mid-sentence, which corrupts the dialogue
  * structure the objective is supposed to learn.
  *
  * Template: each turn renders as `<|role|>\n` + content + `\n` (header
  * length = role length + 5). Loss spans are 0-based [start, end) char
  * offsets of the CONTENT region (headers and trailing newlines are never
  * in-loss) — tokenizer-agnostic, so the same example feeds any tokenizer
  * downstream.
  *
  * Scale shape: ONE shuffle (groupBy conversation + ordered collect);
  * everything after is per-row higher-order-function arithmetic inside
  * codegen. A conversation is the atomic output unit, so the collect_list
  * bound is inherent to the contract — a training example must
  * materialize on one executor regardless. Per-conversation work is
  * O(turns) for both ops — the truncation cut-point is the first
  * prefix-sum crossing of `total - rem` (prefix sums are nondecreasing),
  * found in one linear fold. Determinism: ordering is by the caller's
  * order fields (make them a total order), all arithmetic is integer, all
  * rendering is exact string concat — bit-identical across engines.
  */
object Conversations {

  /** Rendered form of one turn struct (fields `r`, `c`). */
  private def render(t: Column): Column =
    concat(lit("<|"), t.getField("r"), lit("|>\n"), t.getField("c"), lit("\n"))

  /** One linear fold over a turn array carrying the running char offset;
    * yields `struct(sp, lc)` — the `start:end,…` loss-span string and
    * masked char total for `lossRole` content regions of the rendered
    * template. Shared by [[assemble]] (full conversation) and
    * [[truncate]] (kept turns — spans must address the text that will
    * actually be trained on, not the pre-cut original). */
  private def spanFold(arr: Column, lossRole: String): Column =
    aggregate(
      arr,
      struct(lit(0L).as("off"), lit("").as("sp"), lit(0L).as("lc")),
      (acc, t) => {
        val hl = length(t.getField("r")).cast("long") + lit(5L)
        val cl = length(t.getField("c")).cast("long")
        val start = acc.getField("off") + hl
        val end = start + cl
        val isLoss = t.getField("r") === lit(lossRole)
        struct(
          (end + lit(1L)).as("off"),
          when(isLoss,
            concat(acc.getField("sp"),
              when(acc.getField("sp") === lit(""), lit(""))
                .otherwise(lit(",")),
              start.cast("string"), lit(":"), end.cast("string")))
            .otherwise(acc.getField("sp")).as("sp"),
          (acc.getField("lc") + when(isLoss, cl).otherwise(lit(0L))).as("lc"))
      })

  /** Sorted turn array `array<struct<…ord, r, c>>` per conversation —
    * the single shuffle both ops share. NULL roles/contents normalize to
    * empty strings (a NULL turn still occupies its slot; dropping it
    * would silently renumber the dialogue). */
  private def sortedTurns(convField: String, orderFields: Seq[String],
      roleField: String, contentField: String)(df: DataFrame): DataFrame = {
    require(orderFields.nonEmpty, "orderFields must order turns totally")
    val ordered = orderFields.zipWithIndex.map { case (f, i) =>
      col(f).as(s"__o$i")
    }
    val turnStruct = struct(
      ordered :+ coalesce(col(roleField).cast("string"), lit("")).as("r")
        :+ coalesce(col(contentField).cast("string"), lit("")).as("c"): _*)
    df.groupBy(col(convField).as("__conv"))
      .agg(array_sort(collect_list(turnStruct)).as("__ts"))
  }

  /** Assemble one training example per conversation.
    *
    * Output: `(<convField>, n_turns, token_count, text, loss_spans,
    * loss_chars)` — `text` is the rendered template, `token_count` its
    * whitespace token count, `loss_spans` the `start:end` content spans
    * of `lossRole` turns joined with `,` (a canonical string, not an
    * array, so downstream storage and the oracle hash are
    * representation-stable), `loss_chars` their total length. */
  def assemble(convField: String, orderFields: Seq[String],
      roleField: String, contentField: String,
      lossRole: String = "assistant")(df: DataFrame): DataFrame = {
    val g = sortedTurns(convField, orderFields, roleField, contentField)(df)
    g.select(col("__conv").as(convField) +: assembledColumns(lossRole): _*)
  }

  /** The rendered-example projection over a sorted `__ts` turn array —
    * shared verbatim by [[assemble]] and the streaming session form
    * ([[graft.streaming.Streaming.streamingConversationAssemble]]), so
    * batch and stream cannot disagree on the template or the spans. */
  private[graft] def assembledColumns(lossRole: String): Seq[Column] = {
    val text = array_join(transform(col("__ts"), render(_)), "")
    val folded = spanFold(col("__ts"), lossRole)
    Seq(
      size(col("__ts")).cast("long").as("n_turns"),
      size(split(text, " ")).cast("long").as("token_count"),
      text.as("text"),
      folded.getField("sp").as("loss_spans"),
      folded.getField("lc").as("loss_chars"))
  }

  /** Budget-aware truncation: keep the leading `systemRole` turn (if the
    * conversation opens with one — required context for every example)
    * plus the longest SUFFIX of the remaining turns whose content token
    * sum fits `budget` minus the system turn's tokens. Whole turns only;
    * the suffix may be empty when even the final turn overflows. Token
    * counts are over the CONTENT (headers excluded): whitespace counts
    * ([[graft.ext.TextOps.tokenCount]] convention, empty content = 1) by
    * default, or the BPE-ish subword pre-tokenizer
    * ([[graft.ext.TextOps.bpeishPattern]], empty content = 0) with
    * `bpeish = true` — closer to a real tokenizer's budget when the
    * context window is counted in subwords.
    *
    * Output: `(<convField>, n_turns, kept_turns, kept_tokens, text,
    * loss_spans, loss_chars)` — `text` is the rendered KEPT turns and
    * the spans address it (the example that will actually be trained
    * on), in [[assemble]]'s `start:end,…` form over `lossRole`. */
  def truncate(convField: String, orderFields: Seq[String],
      roleField: String, contentField: String, budget: Int,
      systemRole: String = "system", lossRole: String = "assistant",
      bpeish: Boolean = false)(df: DataFrame): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import graft.functions.GraftFunctions.bind
    val g = sortedTurns(convField, orderFields, roleField, contentField)(df)
    val ts = col("__ts")
    val n = size(ts).cast("long")
    val hasSys = element_at(ts, 1).getField("r") === lit(systemRole)
    val startIdx = when(hasSys, lit(1L)).otherwise(lit(0L))
    // smallest cut whose suffix fits, found in ONE linear pass: suffix(k)
    // <= rem  ⇔  prefix(k) >= total - rem, and prefix sums are
    // nondecreasing — so the cut is the first index where the running
    // sum crosses the target (clamped up to startIdx; n when nothing
    // crosses, i.e. even the final turn overflows). Every subtree a
    // lambda re-references (token array, target, cut, kept turns) is
    // pinned with bind() — Catalyst re-evaluates cross-lambda references
    // PER ELEMENT otherwise (the SURVEY §8 CSE hazard), which turns this
    // linear pass quadratic. All five outputs come out of one shared
    // `packed` struct so the Project computes the chain once per row.
    val tokCount: Column => Column =
      if (bpeish) c => size(regexp_extract_all(c,
        lit(graft.ext.TextOps.bpeishPattern), lit(0))).cast("long")
      else c => size(split(c, " ")).cast("long")
    val packed = bind(transform(ts,
        t => tokCount(t.getField("c")))) { tk =>
      val sysTok = when(hasSys, element_at(tk, 1)).otherwise(lit(0L))
      val rem = greatest(lit(budget.toLong) - sysTok, lit(0L))
      val total = aggregate(tk, lit(0L), (a, x) => a + x)
      bind(total - rem) { target =>
        val crossed = aggregate(tk,
          struct(lit(0L).as("i"), lit(0L).as("run"), lit(-1L).as("cut")),
          (acc, t) => {
            val i2 = acc.getField("i") + lit(1L)
            val run2 = acc.getField("run") + t
            struct(i2.as("i"), run2.as("run"),
              when(acc.getField("cut") >= lit(0L), acc.getField("cut"))
                .when(run2 >= target, i2)
                .otherwise(lit(-1L)).as("cut"))
          }).getField("cut")
        val firstCross = when(target <= lit(0L), lit(0L))
          .when(crossed >= lit(0L), crossed)
          .otherwise(n)
        bind(greatest(firstCross, startIdx)) { cut =>
          val keptSuffix = slice(ts, (cut + lit(1L)).cast("int"),
            (n - cut).cast("int"))
          bind(when(hasSys, concat(slice(ts, 1, 1), keptSuffix))
              .otherwise(keptSuffix)) { kept =>
            val folded = spanFold(kept, lossRole)
            struct(
              n.as("nt"),
              size(kept).cast("long").as("kt"),
              (sysTok + aggregate(
                slice(tk, (cut + lit(1L)).cast("int"), (n - cut).cast("int")),
                lit(0L), (a, x) => a + x)).as("ktok"),
              array_join(transform(kept, render(_)), "").as("tx"),
              folded.getField("sp").as("sp"),
              folded.getField("lc").as("lc"))
          }
        }
      }
    }
    g.select(
      col("__conv").as(convField),
      packed.getField("nt").as("n_turns"),
      packed.getField("kt").as("kept_turns"),
      packed.getField("ktok").as("kept_tokens"),
      packed.getField("tx").as("text"),
      packed.getField("sp").as("loss_spans"),
      packed.getField("lc").as("loss_chars"))
  }
}
