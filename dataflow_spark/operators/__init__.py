"""Operator packs. Importing this package registers every operator."""

from dataflow_spark.operators.filters import rule_based, general, dedup  # noqa: F401
from dataflow_spark.operators.filters import jaccard, coreset  # noqa: F401
from dataflow_spark.operators.refiners import text as refiners_text  # noqa: F401
from dataflow_spark.operators import text_analysis, similarity, relational  # noqa: F401
from dataflow_spark.operators import text2sql, conversations  # noqa: F401
from dataflow_spark.operators.eval import text_stats, dataset  # noqa: F401
from dataflow_spark.operators.eval import reference_metrics, code_sandbox  # noqa: F401
from dataflow_spark.operators.generate import llm_map, embedding  # noqa: F401
from dataflow_spark.operators.generate import text_gen, chunking  # noqa: F401
from dataflow_spark.operators import multimodal  # noqa: F401
from dataflow_spark.operators import reasoning, code, knowledge  # noqa: F401
from dataflow_spark.operators.eval import diversity, perplexity, model_scorers  # noqa: F401
from dataflow_spark.operators.refiners import pii  # noqa: F401
from dataflow_spark.operators.eval import llm_judges  # noqa: F401
from dataflow_spark.operators import pdf2vqa, chemistry  # noqa: F401
from dataflow_spark.operators.filters import threshold  # noqa: F401
from dataflow_spark.operators import reasoning_filters, mineru  # noqa: F401
from dataflow_spark.operators import sampling, timeseries  # noqa: F401
from dataflow_spark.operators.filters import decontaminate, substring  # noqa: F401
from dataflow_spark.operators.refiners import segment_dedup  # noqa: F401
from dataflow_spark.operators import keywords, validation, fuzzy_join  # noqa: F401
from dataflow_spark.operators import clustering, graph  # noqa: F401

# Reference-exact names whose engine operator is named differently:
# pipelines written against OpenDCAI/DataFlow resolve without edits.
from dataflow_spark.core.registry import OPERATOR_REGISTRY as _R

for _ref_name, _ours in {
    "NgramSampleEvaluator": "NgramRepetitionEvaluator",
    "PresidioSampleEvaluator": "PIICountEvaluator",
    "KBCChunkGenerator": "ChunkGenerator",
    "KBCMultiHopQAGeneratorBatch": "Text2MultiHopQAGenerator",
    "KBCTextCleanerBatch": "KBCTextCleaner",
    "AgenticRAGQAF1SampleEvaluator": "TokenF1SampleEvaluator",
    "ReasoningAnswerExtractionQwenMathEvalGenerator": "ReasoningAnswerExtractionGenerator",
    "ReasoningPretrainFormatConvertGenerator": "ReasoningFormatConvertGenerator",
    "QA_Merger": "QAMerger",
    "PDF_Merger": "PDFMerger",
    "CodeTextCompositionSampleEvaluator": "CodeTextCompositionEvaluator",
    "LexicalDiversitySampleEvaluator": "LexicalDiversityEvaluator",
    "CoTVotingGenerator": "SQLCoTVotingGenerator",
    "FuncGenerator": "FunctionGenerator",
    "PandasOperator": "TransformOperator",
    "ScenarioExtractGenerator": "ScenarioExtractor",
    "ScenarioExpandGenerator": "ScenarioExpander",
    "Text2SQLCoTVotingGenerator": "SQLCoTVotingGenerator",
    "KBCChunkGeneratorBatch": "ChunkGenerator",
}.items():
    _R.alias(_ref_name, _ours)
