"""Ready-made pipelines mirroring the reference's statics/pipelines
(cpu_pipelines + api_pipelines) — a reference user's entry points,
re-expressed as Pipeline builders over this engine's operators.

Each builder returns a ``Pipeline``; run with ``pipe.forward(df)``.
Because every operator is a lazy DataFrame transform, a whole pipeline
compiles to ONE Catalyst plan — the reference materializes a cache file
between every step (statics/pipelines/cpu_pipelines/text_pt_filter.py
runs 22 read-process-write cycles; here the 22 steps fuse).
"""

from __future__ import annotations

from dataflow_spark.core.pipeline import Pipeline
from dataflow_spark.core.registry import get_operator


def text_pt_filter_pipeline(input_key: str = "text",
                            dedup: bool = True) -> Pipeline:
    """Pretrain-text cleaning pipeline (reference:
    statics/pipelines/cpu_pipelines/text_pt_filter.py — same operator
    sequence and thresholds)."""
    ops = [
        get_operator("RemoveExtraSpacesRefiner", {"input_key": input_key}),
        get_operator("RemoveEmojiRefiner", {"input_key": input_key}),
        get_operator("HtmlUrlRemoverRefiner", {"input_key": input_key}),
    ]
    if dedup:
        ops.append(get_operator("MinHashDeduplicateFilter",
                                {"input_key": input_key, "threshold": 0.9}))
    ops += [
        get_operator("BlocklistFilter", {"input_key": input_key}),
        get_operator("WordNumberFilter", {"input_key": input_key,
                                          "min_words": 20,
                                          "max_words": 100000}),
        get_operator("ColonEndFilter", {"input_key": input_key}),
        get_operator("SentenceNumberFilter", {"input_key": input_key,
                                              "min_sentences": 3,
                                              "max_sentences": 7500}),
        get_operator("LineEndWithEllipsisFilter", {"input_key": input_key,
                                                   "threshold": 0.3}),
        get_operator("ContentNullFilter", {"input_key": input_key}),
        get_operator("MeanWordLengthFilter", {"input_key": input_key,
                                              "min_len": 3, "max_len": 10}),
        get_operator("SymbolWordRatioFilter", {"input_key": input_key,
                                               "threshold": 0.4}),
        get_operator("HtmlEntityFilter", {"input_key": input_key}),
        get_operator("NoPuncFilter", {"input_key": input_key,
                                      "max_run": 112}),
        get_operator("SpecialCharacterFilter", {"input_key": input_key}),
        get_operator("WatermarkFilter", {
            "input_key": input_key,
            "watermarks": ["Copyright", "Watermark", "Confidential"]}),
        get_operator("CurlyBracketFilter", {"input_key": input_key,
                                            "threshold": 0.025}),
        get_operator("CapitalWordsFilter", {"input_key": input_key,
                                            "threshold": 0.2}),
        get_operator("LoremIpsumFilter", {"input_key": input_key}),
        get_operator("UniqueWordsFilter", {"input_key": input_key,
                                           "threshold": 0.1}),
        get_operator("CharNumberFilter", {"input_key": input_key,
                                          "min_chars": 100}),
        get_operator("LineStartWithBulletpointFilter",
                     {"input_key": input_key}),
        get_operator("LineWithJavascriptFilter", {"input_key": input_key}),
    ]
    return Pipeline(ops)


def text_sft_filter_pipeline(input_key: str = "text",
                             serving=None) -> Pipeline:
    """SFT-data quality pipeline (reference:
    statics/pipelines/cpu_pipelines/text_sft_filter.py shape: basic
    gates + deterministic quality scorers; LLM judges only when a
    serving is supplied)."""
    ops = [
        get_operator("ContentNullFilter", {"input_key": input_key}),
        get_operator("WordNumberFilter", {"input_key": input_key,
                                          "min_words": 5,
                                          "max_words": 100000}),
        get_operator("HashDeduplicateFilter", {"input_keys": input_key}),
        get_operator("SuperfilteringSampleEvaluator",
                     {"input_key": input_key}),
        get_operator("DeitaQualitySampleEvaluator", {"input_key": input_key}),
    ]
    if serving is not None:
        ops.append(get_operator("AlpagasusFilter",
                                {"serving": serving, "input_key": input_key}))
    return Pipeline(ops)


def reasoning_cpu_pipeline(answer_key: str = "output",
                           gt_key: str = "golden_answer") -> Pipeline:
    """Reasoning answer-gate pipeline (reference:
    statics/pipelines/cpu_pipelines/reasoning_pipeline.py — formatter ->
    ground-truth match -> n-gram repetition, same defaults)."""
    return Pipeline([
        get_operator("ReasoningAnswerFormatterFilter",
                     {"input_key": answer_key}),
        get_operator("ReasoningAnswerGroundTruthFilter",
                     {"input_test_answer_key": answer_key,
                      "input_gt_answer_key": gt_key}),
        get_operator("ReasoningAnswerNgramFilter",
                     {"input_key": answer_key, "min_score": 0.1,
                      "max_score": 1.0, "ngrams": 5}),
    ])


def reasoning_api_pipeline(serving, question_key: str = "question") -> Pipeline:
    """LLM reasoning synthesis pipeline (reference:
    statics/pipelines/api_pipelines/reasoning_math_pipeline.py shape:
    question filter -> difficulty/category -> answer generation -> answer
    gates)."""
    return Pipeline([
        get_operator("ReasoningQuestionFilter",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningQuestionDifficultySampleEvaluator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningQuestionCategorySampleEvaluator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningAnswerGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningAnswerTokenLengthFilter",
                     {"input_key": "solution"}),
    ])


def text2sql_pipeline(serving, schema_key: str = "schema_ddl") -> Pipeline:
    """Text2SQL synthesis pipeline (reference:
    statics/pipelines/api_pipelines/text2sql_pipeline_gen.py shape:
    generate SQL -> executability gate -> hardness -> question ->
    prompt -> chain-of-thought)."""
    return Pipeline([
        get_operator("SQLGenerator", {"serving": serving}),
        get_operator("SQLExecutionFilter", {}),
        get_operator("SQLComponentClassifier", {}),
        get_operator("Text2SQLQuestionGenerator", {"serving": serving}),
        get_operator("Text2SQLPromptGenerator", {"schema_key": schema_key}),
        get_operator("Text2SQLCoTGenerator", {"serving": serving}),
    ])


def kbc_pipeline(serving, chunk_size: int = 2000) -> Pipeline:
    """Knowledge-base-cleaning pipeline (reference:
    statics/pipelines/api_pipelines/kbcleaning_pipeline.py: markdown ->
    clean -> chunk -> QA extraction). Run after
    FileOrURLToMarkdownConverterLocal has produced the text column."""
    return Pipeline([
        get_operator("KBCTextCleaner", {"input_key": "text"}),
        get_operator("ChunkGenerator", {"input_key": "text",
                                        "chunk_size": chunk_size}),
        get_operator("Text2QAGenerator",
                     {"serving": serving, "input_key": "chunk",
                      "prompt_template": "Generate QA pairs for:\n{chunk}"}),
    ])


def agentic_rag_pipeline(serving, input_key: str = "text") -> Pipeline:
    """Agentic-RAG QA synthesis (reference:
    statics/pipelines/api_pipelines/agentic_rag_pipeline.py: atomic task
    -> depth QA)."""
    return Pipeline([
        get_operator("AgenticRAGAtomicTaskGenerator",
                     {"serving": serving, "input_key": input_key}),
        get_operator("AgenticRAGDepthQAGenerator", {"serving": serving}),
    ])


PIPELINES = {
    "text_pt_filter": text_pt_filter_pipeline,
    "text_sft_filter": text_sft_filter_pipeline,
    "reasoning_cpu": reasoning_cpu_pipeline,
    "reasoning_api": reasoning_api_pipeline,
    "text2sql": text2sql_pipeline,
    "kbc": kbc_pipeline,
    "agentic_rag": agentic_rag_pipeline,
}
