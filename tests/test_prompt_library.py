"""Name-level parity with the reference prompt registry + behavior.

``reference_prompt_names.txt`` is the frozen list of every class the
reference registers via @PROMPT_REGISTRY.register() (grep over
dataflow/prompts/**). Every name must resolve in this engine's prompt
registry with a compatible construct/build_prompt surface.
"""

import json
import os

import pytest

from dataflow_spark.prompts import PROMPT_REGISTRY, get_prompt

NAMES_FILE = os.path.join(os.path.dirname(__file__),
                          "reference_prompt_names.txt")


def _names():
    with open(NAMES_FILE) as f:
        return [ln.strip() for ln in f if ln.strip()]


def test_names_file_is_complete():
    assert len(_names()) == 98


@pytest.mark.parametrize("name", _names())
def test_reference_prompt_name_resolves(name):
    assert name in PROMPT_REGISTRY, f"{name} does not resolve"


def test_format_str_prompt_fields_and_missing_modes():
    p = get_prompt("FormatStrPrompt",
                   {"f_str_template": "Q: {q}\nContext: {ctx}"})
    assert p.fields == ["ctx", "q"]
    assert p.build_prompt(q="why?", ctx="doc") == "Q: why?\nContext: doc"
    with pytest.raises(KeyError):
        p.build_prompt(q="why?")
    lenient = get_prompt("FormatStrPrompt", {
        "f_str_template": "Q: {q} C: {ctx}", "on_missing": "empty"})
    assert lenient.build_prompt(q="x") == "Q: x C: "


def test_filter_prompts_carry_judgement_contract():
    for name in ("MathQuestionFilterPrompt", "GeneralQuestionFilterPrompt"):
        text = get_prompt(name).build_prompt(question="Is 2+2=4?")
        assert '"judgement_test"' in text
        assert "Is 2+2=4?" in text


def test_answer_generators_demand_solution_prefix():
    for name in ("MathAnswerGeneratorPrompt", "GeneralAnswerGeneratorPrompt"):
        text = get_prompt(name).build_prompt(question="Solve x+1=2.")
        assert '"Solution:"' in text
    assert "\\boxed{}" in get_prompt("MathAnswerGeneratorPrompt") \
        .build_prompt(question="q")


def test_fusion_prompts_emit_section_markers():
    for name in ("MathQuestionSequentialFusionGeneratorPrompt",
                 "MathQuestionParallelFusionGeneratorPrompt",
                 "MathQuestionConditionFusionGeneratorPrompt"):
        p = get_prompt(name)
        assert p.build_system_prompt() == ""
        text = p.build_prompt("P1 text", "P2 text")
        assert "#New Problem#:" in text
        assert "P1 text" in text and "P2 text" in text


def test_answer_judge_prompts_json_contract():
    t = get_prompt("AnswerJudgePrompt").build_prompt(
        answer="4", reference_answer="four", question="2+2?")
    assert '"judgement_result"' in t
    t = get_prompt("AnswerJudgeMultipleQuestionsPrompt").build_prompt(
        answer="a", reference_answer="b", question="q")
    assert '"judgement_result"' in t and "array" in t


def test_text2sql_generators_return_tuples_deterministically():
    p = get_prompt("SelectSQLGeneratorPrompt")
    args = (["INSERT INTO t VALUES (1)"], ["CREATE TABLE t (a INT)"],
            "SQLite")
    out1, c1 = p.build_prompt(*args)
    out2, c2 = p.build_prompt(*args)
    assert (out1, c1) == (out2, c2)           # deterministic
    assert c1 in ("Simple", "Moderate", "Complex", "Highly Complex")
    assert "```sql" in out1

    q = get_prompt("Text2SQLQuestionGeneratorPrompt")
    sql = "SELECT a FROM t"
    prompt, style = q.build_prompt(sql, "db1", {"db1": {"a": "col a"}},
                                   "SQLite")
    assert "[QUESTION-START]" in prompt and "[EXPLANATION-START]" in prompt
    prompt2, style2 = q.build_prompt(sql, "db1", {"db1": {"a": "col a"}},
                                     "SQLite")
    assert (prompt, style) == (prompt2, style2)


def test_consistent_chat_modes():
    p = get_prompt("ConsistentChatPrompt")
    prompts = p.build_prompt(mode="query", num_dialogs_per_intent=2)
    assert len(prompts) == 2 * len(p.query_intent_categories)
    assert all('"turns"' in q for q in prompts)
    resp = p.build_prompt(mode="response", topic="plumbing",
                          queries=["How do I fix a leak?"])
    assert "plumbing" in resp and "How do I fix a leak?" in resp
    with pytest.raises(ValueError):
        p.build_prompt(mode="query", topic="x")


def test_agenticrag_contracts():
    t = get_prompt("AtomicTaskGeneratorGetIdentifierPrompt")
    assert "content_identifier" in t.build_system_prompt()
    t = get_prompt("InferenceCheckPrompt").build_prompt(
        "q1", "a1", "d1", "q2", "a2", "d2", "fq", "fa", "inference")
    assert '"valid"' in t and "trivial_concatenation" in t
    t = get_prompt("AtomicTaskGeneratorRecallScorePrompt")
    assert "2 points" in t.build_system_prompt()
    assert "Golden answer: g" in t.build_prompt("g", "o")


def test_prompt_restrict_accepts_registered_diy():
    from dataflow_spark.core.prompt import DIYPromptABC

    diy = get_prompt("DiyQuestionFilterPrompt",
                     {"prompt_template": "check: {question}"})
    assert isinstance(diy, DIYPromptABC)
    assert diy.build_prompt(question="ok") == "check: ok"


def test_kb_cleaner_markers_both_langs():
    for lang in ("en", "zh"):
        t = get_prompt("KnowledgeCleanerPrompt", {"lang": lang}) \
            .build_prompt(raw_content="<p>hi</p>")
        assert "<cleaned_start>" in t and "<cleaned_end>" in t


def test_func_call_eval_json_contract():
    t = get_prompt("ConversationEvalPrompt").build_prompt(
        conversation=json.dumps([{"role": "user", "content": "hi"}]))
    assert '"score"' in t and '"explanation"' in t


def test_llm_map_accepts_prompt_instances_and_names(spark):
    """PromptedGenerator consumes (a) PromptABC instances and (b)
    registered prompt class names, with build_system_prompt picked up
    automatically."""
    from dataflow_spark.core.registry import get_operator
    from dataflow_spark.serving.mock import MockLLMServing

    df = spark.createDataFrame([("What is 2+2?",)], ["text"])
    serving = MockLLMServing(mode="echo")

    # (a) instance: MathAnswerGeneratorPrompt takes one positional arg
    op = get_operator("PromptedGenerator", {
        "serving": serving,
        "prompt_template": get_prompt("MathAnswerGeneratorPrompt")})
    out = op.run(df).collect()[0]["generated"]
    assert "What is 2+2?" in out and "Solution:" in out

    # (b) registered class name as the template string
    op = get_operator("PromptedGenerator", {
        "serving": serving, "prompt_template": "GeneralAnswerGeneratorPrompt"})
    out = op.run(df).collect()[0]["generated"]
    assert "What is 2+2?" in out

    # (c) zero-arg prompts act as instruction prefixes
    op = get_operator("PromptedGenerator", {
        "serving": serving,
        "prompt_template": get_prompt("Text2QAQuestionQualityPrompt")})
    out = op.run(df).collect()[0]["generated"]
    assert "**Grading**" in out and "What is 2+2?" in out

    # plain format strings keep working
    op = get_operator("PromptedGenerator", {
        "serving": serving, "prompt_template": "Summarize: {text}"})
    out = op.run(df).collect()[0]["generated"]
    assert out.startswith("Summarize: What is 2+2?")


def test_reference_prompt_restrictions_applied():
    """Every reference @prompt_restrict(operator -> prompts) pair is
    enforced on our operator classes (resolved via the alias table)."""
    from dataflow_spark.core.registry import OPERATOR_REGISTRY
    from dataflow_spark.prompts.restrictions import (RESTRICTIONS,
                                                     unapplied)

    assert unapplied() == []
    assert len(RESTRICTIONS) == 53  # frozen decoration count (48 files)
    for op_name, prompts in RESTRICTIONS.items():
        cls = OPERATOR_REGISTRY.get(op_name)
        allowed = set(getattr(cls, "__allowed_prompts__", ()))
        assert allowed, f"{op_name} has no whitelist"
        # shared classes behind aliases keep the first-applied set;
        # it must at least cover this mapping or be a superset union
        assert allowed & set(prompts), (op_name, allowed, prompts)


def test_restriction_rejects_wrong_prompt():
    import pytest

    from dataflow_spark.core.registry import OPERATOR_REGISTRY

    cls = OPERATOR_REGISTRY.get("ReasoningQuestionFilter")
    wrong = get_prompt("CodeQualityEvaluatorPrompt")
    with pytest.raises(TypeError, match="accepts prompt templates"):
        cls(prompt_template=wrong)
    # a whitelisted prompt passes the whitelist check (the ctor may
    # still raise for unrelated reasons, e.g. a required serving arg)
    try:
        cls(prompt_template=get_prompt("MathQuestionFilterPrompt"))
    except TypeError as e:
        assert "accepts prompt templates" not in str(e), e
    except Exception:
        pass


def test_prompt_renderer_template_style_and_system_arg_prompts(spark):
    """FormatStrPrompt/DiyCodePrompt route through the kwargs branch
    (not positional), and prompts whose build_system_prompt needs
    per-row args don't crash the renderer (system stays '')."""
    from dataflow_spark.operators.generate.llm_map import _prompt_renderer

    # FormatStrPrompt: need_fields default + **kwargs -> kwargs branch
    render, system = _prompt_renderer(
        get_prompt("FormatStrPrompt", {"f_str_template": "T: {text}"}),
        "text")
    assert render("hello") == "T: hello" and system == ""

    # DiyCodePrompt(**kwargs only) -> kwargs branch keyed by input_key
    render, _ = _prompt_renderer(
        get_prompt("DiyCodePrompt",
                   {"prompt_template": "Do: {instruction}"}),
        "instruction")
    assert render("sort a list") == "Do: sort a list"

    # Alpagasus/Treeinstruct: build_system_prompt requires args -> the
    # renderer must not call it (crash), system falls back to ""
    for name in ("AlpagasusPrompt", "TreeinstructPrompt"):
        render, system = _prompt_renderer(get_prompt(name), "text")
        assert system == ""

    # argless-system prompts still get their system picked up
    _, system = _prompt_renderer(
        get_prompt("AtomicTaskGeneratorGetIdentifierPrompt"), "text")
    assert "content_identifier" in system
