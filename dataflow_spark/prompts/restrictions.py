"""Reference prompt_restrict wiring: operator -> allowed prompt classes.

The reference decorates 48 operators with @prompt_restrict(...)
(grep over dataflow/operators/**); this module applies the SAME
whitelists to this engine's operator classes, resolved through the
operator registry's alias table so reference names bind to our
implementations. Applied once at import of ``dataflow_spark.prompts``
(idempotent; operators whose name doesn't resolve — none today, the
parity test asserts that — are reported by ``unapplied()``).
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, prompt_restrict

# reference operator class name -> allowed prompt class names
# (extracted from @prompt_restrict decorations under
# /root/reference/dataflow/operators/**)
RESTRICTIONS: dict[str, tuple[str, ...]] = {
    "AlpagasusSampleEvaluator": ("AlpagasusPrompt",),
    "TreeinstructSampleEvaluator": ("TreeinstructPrompt",),
    "CondorGenerator": ("CondorQuestionPrompt",),
    "CondorRefiner": ("CondorRefinePrompt",),
    "KBCTextCleaner": ("KnowledgeCleanerPrompt",),
    "KBCTextCleanerBatch": ("KnowledgeCleanerPrompt",),
    "KBCMultiHopQAGeneratorBatch": ("Text2MultiHopQAGeneratorPrompt",),
    "ReasoningQuestionDifficultySampleEvaluator":
        ("MathQuestionDifficultyPrompt",),
    "ReasoningQuestionSolvableSampleEvaluator":
        ("MathQuestionEvaluatorPrompt",),
    "ReasoningQuestionCategorySampleEvaluator":
        ("MathQuestionCategoryPrompt",),
    "ReasoningQuestionFusionGenerator": (
        "MathQuestionParallelFusionGeneratorPrompt",
        "MathQuestionSequentialFusionGeneratorPrompt",
        "MathQuestionConditionFusionGeneratorPrompt"),
    "ReasoningPseudoAnswerGenerator": ("MathAnswerGeneratorPrompt",),
    "ReasoningQuestionGenerator": (
        "MathQuestionSynthesisPrompt", "GeneralQuestionSynthesisPrompt",
        "DiyQuestionSynthesisPrompt"),
    "ReasoningAnswerGenerator": (
        "MathAnswerGeneratorPrompt", "GeneralAnswerGeneratorPrompt",
        "DiyAnswerGeneratorPrompt"),
    "ReasoningQuestionFilter": (
        "MathQuestionFilterPrompt", "GeneralQuestionFilterPrompt",
        "DiyQuestionFilterPrompt"),
    "ReasoningAnswerModelJudgeFilter": (
        "AnswerJudgePromptQuestion", "AnswerJudgePrompt"),
    "ExtractSmilesFromTextGenerator": ("ExtractSmilesFromTextPrompt",),
    "FuncCallConversationSampleEvaluator": ("ConversationEvalPrompt",),
    "ScenarioExtractGenerator": ("ExtractScenarioPrompt",),
    "ScenarioExpandGenerator": ("ExpandScenarioPrompt",),
    "AtomTaskGenerator": ("FuncAtomicTaskGeneratePrompt",),
    "SequentialTaskGenerator": ("SequentialTaskGeneratePrompt",),
    "ParaSeqTaskGenerator": ("ParathenSeqTaskGeneratePrompt",),
    "FunctionGenerator": ("FuncGeneratePrompt",),
    "MultiTurnConversationGenerator": (
        "ConversationUserPrompt", "ConversationAssistantPrompt",
        "ConversationToolPrompt"),
    "ConsistentChatGenerator": ("ConsistentChatPrompt",),
    "CompositionTaskFilter": ("CompositionTaskFilterPrompt",),
    "CodeQualitySampleEvaluator": (
        "CodeQualityEvaluatorPrompt", "DiyCodePrompt"),
    "CodeInstructionToCodeGenerator": (
        "CodeInstructionToCodeGeneratorPrompt", "DiyCodePrompt"),
    "CodeCodeToInstructionGenerator": (
        "CodeCodeToInstructionGeneratorPrompt", "DiyCodePrompt"),
    "CodeEnhancementInstructionGenerator": (
        "CodeInstructionEnhancement", "DiyCodePrompt"),
    "CodeInstructionGenerator": ("CodeInstructionGeneratePrompt",),
    "MetaSampleEvaluator": ("MetaPrompt",),
    "Phi4QAGenerator": ("Phi4QAGeneratorPrompt",),
    "Text2SQLCoTGenerator": ("Text2SQLCotGeneratorPrompt",),
    "SQLVariationGenerator": ("SQLVariationGeneratorPrompt",),
    "SQLGenerator": ("SelectSQLGeneratorPrompt",
                     "SelectVecSQLGeneratorPrompt"),
    "Text2SQLQuestionGenerator": (
        "Text2SQLQuestionGeneratorPrompt",
        "Text2VecSQLQuestionGeneratorPrompt"),
    "SQLByColumnGenerator": ("SelectSQLGeneratorPrompt",
                             "SelectVecSQLGeneratorPrompt"),
    "Text2SQLPromptGenerator": (
        "Text2SQLPromptGeneratorPrompt",
        "Text2VecSQLPromptGeneratorPrompt"),
    "Text2SQLCorrespondenceFilter": (
        "Text2SQLCorrespondenceFilterPrompt",),
    "AgenticRAGAtomicTaskGenerator": (
        "AtomicTaskGeneratorGetIdentifierPrompt",
        "AtomicTaskGeneratorGetConlcusionPrompt",
        "AtomicTaskGeneratorQuestionPrompt",
        "AtomicTaskGeneratorCleanQAPrompt",
        "AtomicTaskGeneratorAnswerPrompt",
        "AtomicTaskGeneratorRecallScorePrompt",
        "AtomicTaskGeneratorOptionalAnswerPrompt",
        "AtomicTaskGeneratorGoldenDocAnswerPrompt"),
    "AgenticRAGDepthQAGenerator": (
        "DepthQAGeneratorGetIdentifierPrompt",
        "DepthQAGeneratorBackwardTaskPrompt",
        "DepthQAGeneratorSupersetCheckPrompt",
        "DepthQAGeneratorQuestionPrompt",
        "DepthQAGeneratorAnswerPrompt",
        "DepthQAGeneratorRecallScorePrompt"),
    "AgenticRAGWidthQAGenerator": (
        "WidthQAGeneratorMergePrompt",
        "WidthQAGeneratorOriginCheckPrompt",
        "WidthQAGeneratorQuestionVerifyPrompt",
        "WidthQAGeneratorAnswerPrompt",
        "WidthQAGeneratorRecallScorePrompt"),
    "Text2QASampleEvaluator": (
        "Text2QAQuestionQualityPrompt", "Text2QAAnswerAlignmentPrompt",
        "Text2QAAnswerVerifiabilityPrompt",
        "Text2QADownstreamValuePrompt"),
    "BenchDatasetEvaluatorQuestion": (
        "AnswerJudgePromptQuestion", "AnswerJudgeMultipleQuestionsPrompt"),
    "UnifiedBenchDatasetEvaluator": ("AnswerJudgePrompt",),
    "BenchDatasetEvaluator": ("AnswerJudgePrompt",),
    "RandomDomainKnowledgeRowGenerator": ("SFTFromScratchGeneratorPrompt",),
    "Text2QAGenerator": ("Text2QAAutoPromptGeneratorPrompt",
                         "Text2QASeedQuestionGeneratorPrompt"),
    "FormatStrPromptedGenerator": ("FormatStrPrompt",),
    "BenchAnswerGenerator": ("FormatStrPrompt",),
    "Text2MultiHopQAGenerator": ("Text2MultiHopQAGeneratorPrompt",),
}

_UNAPPLIED: list[str] = []
_DONE = False


def apply_restrictions() -> None:
    """Wrap each mapped operator's __init__ with the whitelist check
    (idempotent)."""
    global _DONE
    if _DONE:
        return
    import dataflow_spark.operators  # noqa: F401 — force registration
    from dataflow_spark.core.registry import OPERATOR_REGISTRY

    for op_name, prompt_names in RESTRICTIONS.items():
        if op_name not in OPERATOR_REGISTRY:
            _UNAPPLIED.append(op_name)
            continue
        cls = OPERATOR_REGISTRY.get(op_name)
        if getattr(cls, "__allowed_prompts__", None):
            continue  # already wrapped (shared class behind aliases)
        allowed = tuple(PROMPT_REGISTRY.get(p) for p in prompt_names)
        prompt_restrict(*allowed)(cls)
    _DONE = True


def unapplied() -> list[str]:
    """Operator names the wiring could not resolve (should be [])."""
    return list(_UNAPPLIED)
