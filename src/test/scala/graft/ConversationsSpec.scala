package graft

import org.apache.spark.sql.functions._
import graft.ext.Conversations

class ConversationsSpec extends SparkSpec {

  // (conv, ord, role, content)
  private def turns = {
    import spark.implicits._
    Seq(
      (1, 1, "system", "be terse"),        // 2 tokens
      (1, 2, "user", "hi there friend"),   // 3 tokens
      (1, 3, "assistant", "hello"),        // 1 token
      (1, 4, "user", "bye"),               // 1 token
      (1, 5, "assistant", "see you soon"), // 3 tokens
      (2, 2, "assistant", "late"),
      (2, 1, "user", "first")
    ).toDF("conv", "ord", "role", "content")
  }

  test("assemble renders the template in turn order with exact loss spans") {
    import spark.implicits._
    val out = Conversations
      .assemble("conv", Seq("ord"), "role", "content")(turns)
      .orderBy("conv")
      .as[(Int, Long, Long, String, String, Long)].collect()

    val (c1, n1, tok1, text1, spans1, lc1) = out(0)
    assert(c1 === 1 && n1 === 5L)
    val expected1 =
      "<|system|>\nbe terse\n" + "<|user|>\nhi there friend\n" +
        "<|assistant|>\nhello\n" + "<|user|>\nbye\n" +
        "<|assistant|>\nsee you soon\n"
    assert(text1 === expected1)
    // spans point exactly at the assistant contents
    val spanVals = spans1.split(",").map { s =>
      val Array(a, b) = s.split(":"); text1.substring(a.toInt, b.toInt)
    }.toSeq
    assert(spanVals === Seq("hello", "see you soon"))
    assert(lc1 === "hello".length + "see you soon".length)
    assert(tok1 === text1.split(" ").length)

    // conv 2: order field wins over input order
    val (_, n2, _, text2, spans2, _) = out(1)
    assert(n2 === 2L)
    assert(text2 === "<|user|>\nfirst\n<|assistant|>\nlate\n")
    val Array(a2, b2) = spans2.split(":")
    assert(text2.substring(a2.toInt, b2.toInt) === "late")
  }

  test("assemble: NULL role/content normalize to empty; no-loss conv has empty spans") {
    import spark.implicits._
    val df = Seq(
      (1, 1, Option("user"), Option("x")),
      (1, 2, Option.empty[String], Option.empty[String]))
      .toDF("conv", "ord", "role", "content")
    val r = Conversations.assemble("conv", Seq("ord"), "role", "content")(df)
      .as[(Int, Long, Long, String, String, Long)].collect().head
    assert(r._4 === "<|user|>\nx\n<||>\n\n")
    assert(r._5 === "" && r._6 === 0L)
  }

  test("truncate keeps the system turn plus the largest fitting suffix") {
    import spark.implicits._
    // conv 1 content tokens: sys=2, then 3,1,1,3 (total 10)
    // budget 7 -> rem 5: suffix [1,1,3]=5 fits, [3,1,1,3]=8 doesn't
    val out = Conversations
      .truncate("conv", Seq("ord"), "role", "content", budget = 7)(turns)
      .orderBy("conv")
      .as[(Int, Long, Long, Long, String, String, Long)].collect()
    val (_, n1, k1, kt1, text1, spans1, lc1) = out(0)
    assert(n1 === 5L && k1 === 4L && kt1 === 7L)
    assert(text1 ===
      "<|system|>\nbe terse\n" + "<|assistant|>\nhello\n" +
        "<|user|>\nbye\n" + "<|assistant|>\nsee you soon\n")
    // loss spans address the TRUNCATED text, not the original
    val spanVals = spans1.split(",").map { s =>
      val Array(a, b) = s.split(":"); text1.substring(a.toInt, b.toInt)
    }.toSeq
    assert(spanVals === Seq("hello", "see you soon"))
    assert(lc1 === "hello".length + "see you soon".length)
    // conv 2 has no system turn: tokens 1,1; budget 7 keeps everything
    val (_, n2, k2, kt2, text2, _, _) = out(1)
    assert(n2 === 2L && k2 === 2L && kt2 === 2L)
    assert(text2 === "<|user|>\nfirst\n<|assistant|>\nlate\n")
  }

  test("truncate bpeish mode counts subwords: punctuation-heavy turns cost more") {
    import spark.implicits._
    // "a,b" = 1 ws token but 3 bpe-ish tokens; budget 4 keeps both turns
    // under ws counting, only the last under bpeish
    val df = Seq((1, 1, "user", "a,b"), (1, 2, "assistant", "c,d"))
      .toDF("conv", "ord", "role", "content")
    val ws = Conversations.truncate("conv", Seq("ord"), "role", "content",
      budget = 4)(df).select("kept_turns").as[Long].collect().head
    val bp = Conversations.truncate("conv", Seq("ord"), "role", "content",
      budget = 4, bpeish = true)(df)
      .select("kept_turns", "kept_tokens").as[(Long, Long)].collect().head
    assert(ws === 2L)
    assert(bp === ((1L, 3L)))
  }

  test("truncate: zero/overflow budgets degrade to system-only or final-turn-only") {
    import spark.implicits._
    // budget 2 = exactly the system tokens -> suffix empty
    val r2 = Conversations
      .truncate("conv", Seq("ord"), "role", "content", budget = 2)(
        turns.filter(col("conv") === 1))
      .as[(Int, Long, Long, Long, String, String, Long)].collect().head
    assert(r2._3 === 1L && r2._4 === 2L && r2._5 === "<|system|>\nbe terse\n")
    assert(r2._6 === "" && r2._7 === 0L) // no assistant turn survives
    // budget 0 with no system turn -> nothing kept, empty render
    val r0 = Conversations
      .truncate("conv", Seq("ord"), "role", "content", budget = 0)(
        turns.filter(col("conv") === 2))
      .as[(Int, Long, Long, Long, String, String, Long)].collect().head
    assert(r0._3 === 0L && r0._4 === 0L && r0._5 === "")
  }

  test("truncate at a giant budget reproduces assemble's text verbatim") {
    import spark.implicits._
    val full = Conversations
      .assemble("conv", Seq("ord"), "role", "content")(turns)
      .select("conv", "text")
    val kept = Conversations
      .truncate("conv", Seq("ord"), "role", "content", budget = 1000000)(
        turns).select("conv", "text")
    assert(full.except(kept).count() === 0 && kept.except(full).count() === 0)
  }

  test("assemble groups by conversation: one shuffle, no extra exchange") {
    val out = Conversations.assemble("conv", Seq("ord"), "role", "content")(
      turns)
    out.collect() // force AQE-final plan
    // toString prints the Final AND Initial AQE plans — count in the final only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1,
      s"expected a single grouping exchange:\n$plan")
  }
}
