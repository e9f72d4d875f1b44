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
                             serving=None,
                             dedup_order_key: str | None = None) -> Pipeline:
    """SFT-data quality pipeline (reference:
    statics/pipelines/cpu_pipelines/text_sft_filter.py shape: basic
    gates + deterministic quality scorers; LLM judges only when a
    serving is supplied).

    ``dedup_order_key``: column that defines "first occurrence" for the
    dedup stage. The reference keeps the first duplicate in SCAN order;
    on a multi-file distributed read scan order is layout-dependent, so
    pipelines that need a reproducible row set should pin an explicit
    key (e.g. a primary id) — at 10x scale the default surfaced as a
    different-but-equally-scored representative per duplicate class."""
    ops = [
        get_operator("ContentNullFilter", {"input_key": input_key}),
        get_operator("WordNumberFilter", {"input_key": input_key,
                                          "min_words": 5,
                                          "max_words": 100000}),
        get_operator("HashDeduplicateFilter",
                     {"input_keys": input_key,
                      "order_key": dedup_order_key}),
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


def code_pt_filter_pipeline(input_key: str = "code",
                            metadata_gates: bool = False,
                            quality_thresholds: dict | None = None
                            ) -> Pipeline:
    """Code pretrain-filter pipeline (reference:
    statics/pipelines/cpu_pipelines/code_pt_filter.py — same step
    sequence: autogen gate, length, text composition, encoded-data,
    document quality, then — when the input carries the reference's
    file metadata columns (filetype/filename/line_count) and a
    precomputed ``score`` — the file-type content and generic score
    gates; ``metadata_gates=True`` enables those two)."""
    ops = [
        get_operator("CodeAutoGeneratedFilter", {"input_key": input_key}),
        get_operator("CodeLengthSampleFilter", {"input_key": input_key}),
        get_operator("CodeTextCompositionFilter", {"input_key": input_key}),
        get_operator("CodeEncodedDataFilter", {"input_key": input_key}),
        get_operator("CodeDocumentQualityFilter",
                     {"input_key": input_key,
                      "thresholds": quality_thresholds}),
    ]
    if metadata_gates:
        ops += [
            get_operator("CodeFileTypeContentFilter", {}),
            get_operator("CodeGenericScoreFilter", {}),
        ]
    return Pipeline(ops)


def code_gen_dataset_pipeline(serving,
                              instruction_key: str = "instruction") -> Pipeline:
    """Code SFT synthesis (reference:
    statics/pipelines/api_pipelines/code_gen_dataset_pipeline.py:
    instruction enhancement -> code generation -> LLM pair quality ->
    score gate -> sandbox execution check)."""
    return Pipeline([
        get_operator("CodeEnhancementInstructionGenerator",
                     {"serving": serving, "input_key": instruction_key}),
        get_operator("CodeInstructionToCodeGenerator",
                     {"serving": serving,
                      "input_key": "enhanced_instruction"}),
        get_operator("CodeQualitySampleEvaluator",
                     {"serving": serving, "input_key": "code"}),
        get_operator("CodeGenericScoreFilter",
                     {"input_score_key": "code_quality_score",
                      "score_threshold": 8}),
        get_operator("CodeSandboxSampleEvaluator", {"input_key": "code"}),
    ])


def func_call_synthesis_pipeline(serving, chat_key: str = "chat") -> Pipeline:
    """Function-calling conversation synthesis (reference:
    statics/pipelines/api_pipelines/func_call_synthesis.py — the full
    9-step chain: scenario extract/expand -> atomic task -> sequential
    + parallel composition -> decomposition gate -> function schemas ->
    multi-turn conversation -> conversation quality score)."""
    return Pipeline([
        get_operator("ScenarioExtractGenerator",
                     {"serving": serving, "input_key": chat_key}),
        get_operator("ScenarioExpandGenerator", {"serving": serving}),
        get_operator("AtomTaskGenerator", {"serving": serving}),
        get_operator("SequentialTaskGenerator", {"serving": serving}),
        get_operator("ParaSeqTaskGenerator", {"serving": serving}),
        get_operator("CompositionTaskFilter", {"serving": serving}),
        get_operator("FunctionGenerator", {"serving": serving}),
        get_operator("MultiTurnConversationGenerator",
                     {"serving": serving, "seed_key": chat_key}),
        get_operator("FuncCallConversationSampleEvaluator",
                     {"serving": serving, "input_key": "conversations"}),
    ])


def text2qa_pipeline(serving, input_key: str = "text",
                     num_samples: int = 100,
                     embedding_serving=None) -> Pipeline:
    """Text→QA synthesis (reference:
    statics/pipelines/api_pipelines/text2qa_pipeline.py: KCenterGreedy
    content choice -> QA generation -> QA quality scoring). The
    reference's input carries precomputed embeddings; here an
    EmbeddingGenerator stage produces them from the text column
    (``embedding_serving`` defaults to the deterministic hash
    embedder), and the judge scores the GENERATED question."""
    return Pipeline([
        get_operator("EmbeddingGenerator",
                     {"serving": embedding_serving, "input_key": input_key}),
        get_operator("KCenterGreedyFilter", {"num_samples": num_samples}),
        get_operator("Text2QAGenerator",
                     {"serving": serving, "input_key": input_key}),
        get_operator("Text2QASampleEvaluator",
                     {"serving": serving, "input_key": "question"}),
    ])


def text_sft_synthesis_pipeline(serving, num_pairs: int = 50) -> Pipeline:
    """SFT synthesis from scratch (reference:
    statics/pipelines/api_pipelines/text_sft_synthesis_pipeline.py:
    Condor generate -> Condor critique/refine -> Alpagasus gate)."""
    return Pipeline([
        get_operator("CondorGenerator",
                     {"serving": serving, "num_pairs": num_pairs}),
        get_operator("CondorRefiner", {"serving": serving}),
        get_operator("AlpagasusFilter",
                     {"serving": serving, "input_key": "answer"}),
    ])


def conversation_synthesis_pipeline(serving,
                                    num_per_topic: int = 2) -> Pipeline:
    """Multi-turn conversation synthesis (reference:
    statics/pipelines/api_pipelines/
    text_conversation_synthesis_pipeline.py: ConsistentChat)."""
    return Pipeline([
        get_operator("ConsistentChatGenerator",
                     {"serving": serving, "num_per_topic": num_per_topic}),
    ])


def chemistry_pipeline() -> Pipeline:
    """SMILES extraction + equivalence scoring (reference:
    statics/pipelines/api_pipelines/chemistry_smiles.py)."""
    return Pipeline([
        get_operator("ExtractSmilesFromTextGenerator", {}),
        get_operator("SmilesEquivalenceDatasetEvaluator", {}),
    ])


def bench_eval_pipeline(serving, match_mode: str = "exact",
                        question_key: str = "question",
                        gt_key: str = "gold") -> Pipeline:
    """Benchmark answer generation + unified scoring (reference:
    statics/pipelines/gpu_pipelines/benchmark_eval/
    unified_bench_eval_type{1..6}.py — the type variants differ only in
    serving backend and match mode, parameterized here)."""
    return Pipeline([
        get_operator("BenchAnswerGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("UnifiedBenchDatasetEvaluator",
                     {"answer_key": "model_answer", "gt_key": gt_key,
                      "match_mode": match_mode}),
    ])


def text2sql_refine_pipeline(serving, db_path: str | None = None,
                             vec: bool = False, embedder=None) -> Pipeline:
    """Text2SQL refinement (reference:
    statics/pipelines/api_pipelines/text2sql_pipeline_refine.py:
    executability gate -> variation -> re-gate -> question ->
    correspondence gate -> prompt -> CoT -> CoT voting -> hardness).
    ``vec=True`` runs the executability gates in VecSQL mode (see
    text2vecsql_gen_pipeline)."""
    gate = {"db_path": db_path, "vec": vec, "embedder": embedder}
    return Pipeline([
        get_operator("SQLExecutabilityFilter", dict(gate)),
        get_operator("SQLVariationGenerator", {"serving": serving}),
        get_operator("SQLExecutabilityFilter", dict(gate)),
        get_operator("Text2SQLQuestionGenerator", {"serving": serving}),
        get_operator("Text2SQLCorrespondenceFilter", {"serving": serving}),
        get_operator("Text2SQLPromptGenerator", {}),
        get_operator("Text2SQLCoTGenerator", {"serving": serving}),
        get_operator("Text2SQLCoTVotingGenerator", {"serving": serving}),
        get_operator("SQLComponentClassifier", {}),
    ])


def reasoning_pretrain_pipeline(serving,
                                question_key: str = "question") -> Pipeline:
    """Reasoning data -> pretrain-format text (reference:
    statics/pipelines/api_pipelines/reasoning_pretrain_pipeline.py:
    question gate -> has-ground-truth branch -> answer generation ->
    n-gram repetition gate -> SFT-to-pretrain format convert)."""
    return Pipeline([
        get_operator("ReasoningQuestionFilter",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningAnswerPipelineRootFilter", {}),
        get_operator("ReasoningAnswerGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningAnswerNgramFilter",
                     {"input_key": "solution"}),
        get_operator("ReasoningPretrainFormatConvertGenerator",
                     {"question_key": question_key,
                      "answer_key": "solution"}),
    ])


def prompted_core_text_pipeline(kind: str, serving,
                                prompt_template: str = "{text}",
                                input_key: str = "text") -> Pipeline:
    """One-step prompted eval/filter/refine (reference:
    statics/pipelines/core_text/prompted_{eval,filter,refine}.py)."""
    ops = {"eval": "PromptedEvaluator", "filter": "PromptedFilter",
           "refine": "PromptedRefiner"}
    if kind not in ops:
        raise ValueError("kind must be eval|filter|refine")
    return Pipeline([
        get_operator(ops[kind], {"serving": serving,
                                 "prompt_template": prompt_template,
                                 "input_key": input_key}),
    ])


PIPELINES.update({
    "code_pt_filter": code_pt_filter_pipeline,
    "code_gen_dataset": code_gen_dataset_pipeline,
    "func_call_synthesis": func_call_synthesis_pipeline,
    "text2qa": text2qa_pipeline,
    "text_sft_synthesis": text_sft_synthesis_pipeline,
    "conversation_synthesis": conversation_synthesis_pipeline,
    "chemistry_smiles": chemistry_pipeline,
    "bench_eval": bench_eval_pipeline,
    "text2sql_refine": text2sql_refine_pipeline,
    "reasoning_pretrain": reasoning_pretrain_pipeline,
    "prompted_core_text": prompted_core_text_pipeline,
})


def reasoning_diy_pipeline(serving,
                           question_key: str = "question") -> Pipeline:
    """DIY reasoning synthesis (reference:
    statics/pipelines/api_pipelines/reasoning_diy_pipeline.py: question
    gate -> question synthesis -> answer generation -> n-gram
    repetition gate)."""
    return Pipeline([
        get_operator("ReasoningQuestionFilter",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningQuestionGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningAnswerGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningAnswerNgramFilter",
                     {"input_key": "solution"}),
    ])


def reasoning_general_pipeline(serving, question_key: str = "question",
                               reference_key: str = "golden_answer"
                               ) -> Pipeline:
    """General (non-math) reasoning synthesis (reference:
    statics/pipelines/api_pipelines/reasoning_general_pipeline.py —
    the DIY chain plus the model-judge answer gate between generation
    and the n-gram gate; the judge labels rather than drops, as the
    reference's keep_all_samples=True)."""
    return Pipeline([
        get_operator("ReasoningQuestionFilter",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningQuestionGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningAnswerGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("ReasoningAnswerModelJudgeFilter",
                     {"serving": serving, "question_key": question_key,
                      "answer_key": "solution",
                      "reference_key": reference_key,
                      "keep_all_samples": True}),
        get_operator("ReasoningAnswerNgramFilter",
                     {"input_key": "solution"}),
    ])


_FUSION_PROMPTS = {
    # same three fusion modes as the reference's
    # MathQuestion{Sequential,Parallel,Condition}FusionGeneratorPrompt;
    # original prose, same output contract (#New Problem# marker)
    "sequential": (
        "Chain these two math problems so the answer of the first feeds "
        "the second, then state the merged problem after a line "
        "'#New Problem#'.\nProblem 1: {question}\n"
        "Problem 2: {most_similar_problem}"),
    "parallel": (
        "Combine these two independent math problems into one problem "
        "with two parts, then state it after a line '#New Problem#'.\n"
        "Problem 1: {question}\nProblem 2: {most_similar_problem}"),
    "condition": (
        "Use a condition from the second problem to constrain the "
        "first, then state the merged problem after a line "
        "'#New Problem#'.\nProblem 1: {question}\n"
        "Problem 2: {most_similar_problem}"),
}


def reasoning_math_mathfusion_pipeline(serving, embedding_serving=None,
                                       question_key: str = "question",
                                       knn: str = "brute") -> Pipeline:
    """MathFusion synthesis (reference: statics/pipelines/api_pipelines/
    reasoning_math_pipeline_mathfusion.py: embed questions -> pair each
    with its most-similar peer -> sequential/parallel/condition fusion
    -> combine all generated questions long-format -> solvable judge ->
    extract the '#New Problem#' body).

    Spark-first deviation: the reference finds the most-similar peer
    with an all-pairs GPU matmul (torch.matmul(E, E.T) on a single
    node); here the pairing is the engine's KNN operator — exact
    broadcast top-1 (``knn='brute'``, guarded by its broadcast bound)
    or hyperplane-LSH top-1 (``knn='lsh'``) for corpus scale.
    """
    if knn not in ("brute", "lsh"):
        raise ValueError("knn must be brute|lsh")

    def most_similar(df):
        from pyspark.sql import functions as F

        base = df.withColumn("_qid", F.xxhash64(question_key))
        op = get_operator("BruteForceKNN" if knn == "brute" else "LSHKNN",
                          {"id_key": "_qid", "embedding_key": "embedding",
                           "k": 1})
        pairs = op.run(base.select("_qid", "embedding").distinct())
        nq = base.select(F.col("_qid").alias("neighbor_id"),
                         F.col(question_key).alias("most_similar_problem"))
        return (base
                .join(pairs.withColumnRenamed("query_id", "_qid"),
                      "_qid", "left")
                .join(nq.dropDuplicates(["neighbor_id"]),
                      "neighbor_id", "left")
                .drop("neighbor_id", "cosine_sim", "_qid", "embedding"))

    def combine_long(df):
        from pyspark.sql import functions as F

        cols = [question_key] + [c for c in df.columns
                                 if c.endswith("_question")]
        stacked = df.select(F.explode(F.array(
            *[F.col(c) for c in cols])).alias("questions"))
        return stacked.filter(F.col("questions").isNotNull()).distinct()

    def extract_new_problem(df):
        from pyspark.sql import functions as F

        got = F.regexp_extract("questions",
                               r"(?s)#New Problem#[:\s]*(.*)", 1)
        return (df.withColumn("refined_question", F.trim(got))
                .filter(F.col("refined_question") != ""))

    fusions = [
        get_operator("FormatStrPromptedGenerator", {
            "serving": serving, "format_str": tmpl,
            "input_keys": [question_key, "most_similar_problem"],
            "output_key": f"{mode}_question"})
        for mode, tmpl in _FUSION_PROMPTS.items()]
    return Pipeline([
        get_operator("EmbeddingGenerator",
                     {"serving": embedding_serving,
                      "input_key": question_key}),
        get_operator("PandasOperator",
                     {"transforms": [most_similar],
                      "consumes": ["embedding", question_key],
                      "provides": ["most_similar_problem"]}),
        *fusions,
        get_operator("PandasOperator",
                     {"transforms": [combine_long],
                      "consumes": [question_key],
                      "provides": ["questions"]}),
        get_operator("ReasoningQuestionSolvableSampleEvaluator",
                     {"serving": serving, "input_key": "questions"}),
        get_operator("PandasOperator",
                     {"transforms": [extract_new_problem],
                      "consumes": ["questions"],
                      "provides": ["refined_question"]}),
    ])


def text2vecsql_gen_pipeline(serving, schema_key: str = "schema_ddl",
                             db_path: str | None = None,
                             embedder=None) -> Pipeline:
    """Vector-SQL synthesis (reference: statics/pipelines/api_pipelines/
    text2vecsql_pipeline_gen.py: column-driven SQL generation ->
    executability gate -> question -> prompt -> component hardness ->
    execution-status classifier). The execution stages run in VecSQL
    mode: each executor connection goes through SQLiteVecConnector
    (native sqlite-vec when installed, pure-python distance functions +
    MATCH-KNN lowering otherwise) with lembed(...) rewritten through
    ``embedder`` (default: the deterministic hash embedder)."""
    from dataflow_spark.serving import HashEmbeddingServing

    embedder = embedder or HashEmbeddingServing(dim=64)
    return Pipeline([
        get_operator("SQLByColumnGenerator",
                     {"serving": serving, "schema_key": schema_key}),
        get_operator("SQLExecutionFilter",
                     {"db_path": db_path, "vec": True,
                      "embedder": embedder}),
        get_operator("Text2SQLQuestionGenerator", {"serving": serving}),
        get_operator("Text2SQLPromptGenerator", {"schema_key": schema_key}),
        get_operator("SQLComponentClassifier", {}),
        get_operator("SQLExecutionClassifier",
                     {"db_path": db_path, "vec": True,
                      "embedder": embedder}),
    ])


def text2sql_cpu_pipeline(db_path: str | None = None,
                          schema_key: str = "schema_ddl") -> Pipeline:
    """No-LLM Text2SQL curation (reference:
    statics/pipelines/cpu_pipelines/text2sql_pipeline.py: executability
    gate -> prompt build -> component hardness; the only statics
    pipeline that runs fully without a serving)."""
    return Pipeline([
        get_operator("SQLExecutionFilter", {"db_path": db_path}),
        get_operator("Text2SQLPromptGenerator", {"schema_key": schema_key}),
        get_operator("SQLComponentClassifier", {}),
    ])


def kbc_url_pipeline(chunk_size: int = 1000,
                     api_key: str | None = None) -> Pipeline:
    """URL knowledge-base cleaning (reference:
    statics/pipelines/cpu_pipelines/kbcleaning_pipeline_url.py:
    URL/file -> markdown via the MinerU API seam -> chunking)."""
    return Pipeline([
        get_operator("FileOrURLToMarkdownConverterAPI",
                     {"api_key": api_key}),
        get_operator("KBCChunkGenerator", {"chunk_size": chunk_size}),
    ])


def code_code_to_sft_pipeline(serving) -> Pipeline:
    """Raw code -> SFT pairs (reference: statics/pipelines/api_pipelines/
    code_code_to_sft_data_pipeline.py: back-translate instruction ->
    regenerate code -> LLM pair quality -> score gate -> sandbox
    check)."""
    return Pipeline([
        get_operator("CodeCodeToInstructionGenerator",
                     {"serving": serving, "input_key": "code"}),
        get_operator("CodeInstructionToCodeGenerator",
                     {"serving": serving, "input_key": "back_instruction"}),
        get_operator("CodeQualitySampleEvaluator",
                     {"serving": serving, "input_key": "code"}),
        get_operator("CodeQualityScoreFilter",
                     {"serving": serving,
                      "instruction_key": "back_instruction"}),
        get_operator("CodeSandboxSampleEvaluator", {"input_key": "code"}),
    ])


def bencheval_semantic_pipeline(answer_key: str = "answer",
                                gt_key: str = "gold") -> Pipeline:
    """Single-step per-sample benchmark scoring (reference:
    statics/pipelines/api_pipelines/
    core_text_bencheval_semantic_pipeline.py: BenchDatasetEvaluator
    over an answers file)."""
    return Pipeline([
        get_operator("BenchDatasetEvaluator",
                     {"answer_key": answer_key, "gt_key": gt_key}),
    ])


def bencheval_question_pipeline(serving,
                                question_key: str = "question",
                                gt_key: str = "gold") -> Pipeline:
    """Generate answers then score at question level (reference:
    statics/pipelines/api_pipelines/
    core_text_bencheval_semantic_pipeline_question.py:
    ReasoningAnswerGenerator -> BenchDatasetEvaluatorQuestion; the
    reference backs generation with a local vLLM — any LLMServing slots
    in here)."""
    return Pipeline([
        get_operator("ReasoningAnswerGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("BenchDatasetEvaluatorQuestion",
                     {"answer_key": "solution", "gt_key": gt_key}),
    ])


def bencheval_question_single_step_pipeline(answer_key: str = "answer",
                                            gt_key: str = "gold") -> Pipeline:
    """Question-level scoring over pre-generated answers (reference:
    statics/pipelines/api_pipelines/
    core_text_bencheval_semantic_pipeline_question_single_step.py)."""
    return Pipeline([
        get_operator("BenchDatasetEvaluatorQuestion",
                     {"answer_key": answer_key, "gt_key": gt_key}),
    ])


def pdf_vqa_extract_pipeline(serving, mineru_backend: str = "local",
                             chunk_chars: int = 2000) -> Pipeline:
    """PDF -> VQA pairs (reference: statics/pipelines/api_pipelines/
    pdf_vqa_extract_pipeline.py: merge per-page PDFs -> MinerU markdown
    -> LLM-input layout -> chunked QA extraction -> parse LLM output ->
    merge QA back per document -> VQA conversation format)."""
    converter = ("FileOrURLToMarkdownConverterFlash"
                 if mineru_backend == "flash"
                 else "FileOrURLToMarkdownConverterLocal")
    return Pipeline([
        get_operator("PDF_Merger", {}),
        get_operator(converter, {}),
        get_operator("MinerU2LLMInputOperator", {}),
        get_operator("ChunkedPromptedGenerator",
                     {"serving": serving, "chunk_chars": chunk_chars,
                      "prompt_template":
                          "Extract question-answer pairs grounded in "
                          "this page:\n{chunk}",
                      "output_key": "llm_output"}),
        get_operator("LLMOutputParser",
                     {"fields": {"question": "question",
                                 "answer": "answer"}}),
        get_operator("QA_Merger", {}),
        get_operator("VQAFormatter", {}),
    ])


def agentic_rag_multihop_pipeline(serving, corpus, embedder=None,
                                  question_key: str = "question",
                                  depth: int = 2) -> Pipeline:
    """Multi-hop RAG QA synthesis (reference:
    statics/pipelines/api_pipelines/
    agentic_rag_multihop_core_pipeline.py — retrieve supporting docs,
    generate atomic QA, deepen into multi-hop chains, verify-filter).
    The reference drives ~20 FormatStrPromptedGenerator/PandasOperator
    steps plus three driver-side verify loops; the chain here keeps the
    same retrieve -> atomic -> deepen -> verify skeleton with the
    engine's agentic operators (each one LLM-map per step, no
    per-row loops). ``corpus`` is the retrieval corpus DataFrame."""
    from dataflow_spark.serving import HashEmbeddingServing

    embedder = embedder or HashEmbeddingServing(dim=64)
    return Pipeline([
        (get_operator("RetrievalGenerator",
                      {"serving": serving, "embedder": embedder,
                       "input_key": question_key}), {"corpus": corpus}),
        get_operator("AgenticRAGAtomicTaskGenerator",
                     {"serving": serving, "input_key": question_key}),
        get_operator("AgenticRAGDepthQAGenerator",
                     {"serving": serving, "depth": depth}),
        get_operator("GeneralFilter",
                     {"predicates": ["depth_task IS NOT NULL",
                                     "length(depth_task) > 0"]}),
    ])


PIPELINES.update({
    "pdf_vqa_extract": pdf_vqa_extract_pipeline,
    "reasoning_diy": reasoning_diy_pipeline,
    "reasoning_general": reasoning_general_pipeline,
    "reasoning_math_mathfusion": reasoning_math_mathfusion_pipeline,
    "text2vecsql_gen": text2vecsql_gen_pipeline,
    "text2sql_cpu": text2sql_cpu_pipeline,
    "kbc_url": kbc_url_pipeline,
    "code_code_to_sft": code_code_to_sft_pipeline,
    "bencheval_semantic": bencheval_semantic_pipeline,
    "bencheval_question": bencheval_question_pipeline,
    "bencheval_question_single_step": bencheval_question_single_step_pipeline,
    "agentic_rag_multihop": agentic_rag_multihop_pipeline,
})

# Reference statics module -> PIPELINES entry, exhaustively: a reference
# user can find every statics pipeline by its original module name
# (tests/test_pipelines_pack.py asserts this map covers the reference
# statics directory listing and that every value exists).
REFERENCE_STATICS_MAP = {
    # api_pipelines/
    "agentic_rag_multihop_core_pipeline": "agentic_rag_multihop",
    "agentic_rag_pipeline": "agentic_rag",
    "chemistry_smiles": "chemistry_smiles",
    "code_code_to_sft_data_pipeline": "code_code_to_sft",
    "code_gen_dataset_pipeline": "code_gen_dataset",
    "core_text_bencheval_semantic_pipeline": "bencheval_semantic",
    "core_text_bencheval_semantic_pipeline_question": "bencheval_question",
    "core_text_bencheval_semantic_pipeline_question_single_step":
        "bencheval_question_single_step",
    "func_call_synthesis": "func_call_synthesis",
    "kbcleaning_pipeline": "kbc",
    "pdf_vqa_extract_pipeline": "pdf_vqa_extract",
    "reasoning_diy_pipeline": "reasoning_diy",
    "reasoning_general_pipeline": "reasoning_general",
    "reasoning_math_pipeline": "reasoning_api",
    "reasoning_math_pipeline_mathfusion": "reasoning_math_mathfusion",
    "reasoning_pretrain_pipeline": "reasoning_pretrain",
    "text2qa_pipeline": "text2qa",
    "text2sql_pipeline_gen": "text2sql",
    "text2sql_pipeline_refine": "text2sql_refine",
    "text2vecsql_pipeline_gen": "text2vecsql_gen",
    "text_conversation_synthesis_pipeline": "conversation_synthesis",
    "text_sft_synthesis_pipeline": "text_sft_synthesis",
    # cpu_pipelines/
    "code_pt_filter": "code_pt_filter",
    "kbcleaning_pipeline_url": "kbc_url",
    "reasoning_pipeline": "reasoning_cpu",
    "text2sql_pipeline": "text2sql_cpu",
    "text_pt_filter": "text_pt_filter",
    "text_sft_filter": "text_sft_filter",
}
