"""Math-reasoning prompts (reference:
dataflow/prompts/reasoning/math.py:1-479).

Output contracts preserved: answer generator → "Solution:" +
``\\boxed{}`` final answer; category → JSON with primary_category /
secondary_category; difficulty → trailing "Difficulty: <number>";
filter → JSON judgement_test/error_type; fusion generators → section
markers ``#…#:`` ending in ``#New Problem#:``; evaluator →
``#Judgement#:`` / ``#Explanation#:``.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC


@PROMPT_REGISTRY.register()
class MathAnswerGeneratorPrompt(PromptABC):
    """Step-by-step math solution ending in \\boxed{} notation."""

    def build_prompt(self, question: str) -> str:
        return (
            "You are a math solver. Produce ONLY the worked solution to "
            "the problem below, following this structure:\n"
            "1. Identify the key components of the problem\n"
            "2. Apply theorems/formulas with step-by-step derivation\n"
            "3. Perform calculations, verifying intermediate values\n"
            "4. Give the final answer in \\boxed{} notation\n\n"
            "Formatting rules:\n"
            "- Prefix every derivation step with the arrow symbol →\n"
            "- Write mathematical symbols as LaTeX commands (e.g. \\geq, "
            "\\div)\n\n"
            "The problem to solve:\n" + question +
            "\nYour response must start directly with \"Solution:\" and "
            "finish immediately after the boxed answer."
        )


@PROMPT_REGISTRY.register()
class MathQuestionSynthesisPrompt(PromptABC):
    """New solvable math problem derived from an original via named
    transformations."""

    def build_prompt(self, items: str, question: str) -> str:
        return (
            "Write one new, reasonable, solvable math problem inspired by "
            "the original below, applying transformations with emphasis "
            f"on all of: \"{items}\". Options: change numeric values or "
            "expressions; shift the problem type (ratios/percentages, "
            "derivative↔integral, area↔perimeter); set it in a "
            "real-world scenario; add premises requiring an extra factor; "
            "or add conditions that force case-by-case analysis.\n\n"
            "Original problem:\n" + question + "\n"
            "Change more than the surface story — aim for a problem that "
            "needs a different solution approach. Start directly with the "
            "problem statement (no framing phrases) and stop immediately "
            "after it."
        )


@PROMPT_REGISTRY.register()
class MathQuestionCategoryPrompt(PromptABC):
    """Two-level math taxonomy classification; JSON output with keys
    primary_category / secondary_category."""

    TAXONOMY = (
        "1. Foundations and Logic\n"
        "   - 1.1 Mathematical Logic and Set Theory\n"
        "   - 1.2 Basic Theory, Formalization, and History & Education\n"
        "2. Algebra and Number Theory\n"
        "   - 2.1 Linear Algebra and Group Theory\n"
        "   - 2.2 Ring Theory, Field Theory, and Polynomial Algebra\n"
        "   - 2.3 Commutative Algebra and Homological/Categorical Methods\n"
        "   - 2.4 Number Theory\n"
        "   - 2.5 Algebraic Geometry\n"
        "3. Analysis and Differential Equations\n"
        "   - 3.1 Real Analysis, Measure Theory, and Functional Analysis\n"
        "   - 3.2 Complex Analysis and Special Functions\n"
        "   - 3.3 Differential Equations and Dynamical Systems\n"
        "   - 3.4 Integral Transforms, Integral Equations, and Difference "
        "Equations\n"
        "   - 3.5 Harmonic Analysis\n"
        "4. Geometry and Topology\n"
        "   - 4.1 Euclidean, Analytic, and Convex/Discrete Geometry\n"
        "   - 4.2 Differential Geometry and Manifold Theory\n"
        "   - 4.3 Topology and Algebraic Topology\n"
        "5. Probability, Statistics, and Discrete Mathematics\n"
        "   - 5.1 Probability Theory and Stochastic Processes\n"
        "   - 5.2 Mathematical Statistics\n"
        "   - 5.3 Combinatorics and Graph Theory\n"
        "6. Applied and Computational Mathematics\n"
        "   - 6.1 Numerical Analysis and Computational Methods\n"
        "   - 6.2 Optimal Control, Variational Methods, and Optimization\n"
        "   - 6.3 Operations Research and Game Theory\n"
        "   - 6.4 Systems Theory and Control\n"
        "   - 6.5 Computer Science and Algorithms\n"
        "   - 6.6 Mathematical Physics and Engineering Mathematics\n"
        "   - 6.7 Information and Communication\n"
        "   - 6.8 Biomathematics\n"
        "7. Arithmetic\n"
        "   - 7.1 Basic Arithmetic and Number Operations\n"
        "   - 7.2 Word Problems and Real-Life Applications\n"
    )

    def build_prompt(self, question: str) -> str:
        return (
            "You are a mathematics classification assistant. Assign the "
            "text below one primary and one secondary category from this "
            "taxonomy. Output ONLY a JSON object with the keys "
            '"primary_category" and "secondary_category" — no other '
            "text.\n\nTaxonomy:\n" + self.TAXONOMY +
            "\nThe text to classify:\n" + question
        )


@PROMPT_REGISTRY.register()
class MathQuestionDifficultyPrompt(PromptABC):
    """Olympiad-style 1-10 difficulty rating; the rating must appear on
    the last line as 'Difficulty: <score>'."""

    def build_prompt(self, question: str) -> str:
        return (
            "You are an experienced competition-math teacher rating "
            "problem difficulty on the 1-10 scale used for contest "
            "problems, calibrated roughly as: 1 = introductory AMC 8 "
            "level (counting, direct arithmetic); 2-3 = mid/late AMC "
            "10/12 (one clever observation, standard techniques); 3.5-4.5 "
            "= AIME level (multi-step, requires combining techniques); "
            "5-6 = olympiad qualifying / early IMO shortlist (proof "
            "insight needed); 7-8 = hard IMO problems; 9-10 = research- "
            "adjacent, solved by very few contestants.\n"
            "Half-point ratings are allowed. Briefly justify, then end "
            "your response with a final line of exactly:\n"
            "Difficulty: <score>\n\n"
            "The problem to rate:\n" + question
        )


@PROMPT_REGISTRY.register()
class MathQuestionFilterPrompt(PromptABC):
    """Four-stage validity check on a math problem; final output is a
    JSON object with keys judgement_test / error_type."""

    def build_prompt(self, question: str) -> str:
        return (
            "You are given a candidate math problem. Run these checks in "
            "order and stop at the first failure:\n"
            "0. The input must be a math problem only — no bundled "
            "answer, no meta-instructions like \"rewrite\"; otherwise "
            "judgement_test is false.\n"
            "1. Check spelling, grammar, and LaTeX formatting only, "
            "without judging semantics.\n"
            "2. Check every minimal condition against mathematical and "
            "real-world validity (e.g. 'half a person' fails; magical "
            "setups pass only when explicitly assumed; averages like "
            "15.5 items/minute are fine).\n"
            "3. Check for contradictions between conditions and for "
            "unreasonable or unsolvable outcomes.\n"
            "4. Check that the conditions suffice to answer the question "
            "(redundant conditions are acceptable; analytical and "
            "numerical solutions both count unless specified).\n\n"
            "You may show your chain of thought, but the FINAL output "
            "must be exactly this JSON object:\n"
            "{\n"
            '    "judgement_test": true/false,\n'
            '    "error_type": "<error description or null>"\n'
            "}\n\n"
            "Problem to evaluate:\n"
            "-------------------------------\n"
            f"{question}\n"
            "-------------------------------\n"
        )


class _FusionBase(PromptABC):
    """Shared scaffolding for the three two-problem fusion prompts."""

    ROLE = ""
    GUIDELINES = ""
    SECTIONS = ()

    def build_system_prompt(self) -> str:
        return ""

    def build_prompt(self, input_question_1, input_question_2) -> str:
        sections = "\n".join(f"{s}:" for s in self.SECTIONS)
        return (
            f"# Role: {self.ROLE}\n"
            f"## Guidelines\n{self.GUIDELINES}\n"
            "## Output Format\n"
            "Reply strictly in this format:\n"
            f"{sections}\n"
            "## Input\n"
            f"### #Problem 1#\n{input_question_1}\n"
            f"### #Problem 2#\n{input_question_2}\n"
            "## Output\n"
        )


@PROMPT_REGISTRY.register()
class MathQuestionSequentialFusionGeneratorPrompt(_FusionBase):
    """Merge two problems so Problem 1's output feeds Problem 2."""

    ROLE = "Mathematical Problem Merger"
    GUIDELINES = (
        "Step 1: Identify the input and output variables, relationships, "
        "and constraints of both problems; find variables that can form "
        "a sequential dependency between them.\n"
        "Step 2: Plan the merge: use #Problem 1#'s output variable to "
        "replace one input variable of #Problem 2#, embed both in one "
        "unified scenario, and align units.\n"
        "Step 3: Write a single #New Problem# in which solving "
        "#Problem 1# is a prerequisite for #Problem 2#. State the "
        "variable dependency explicitly, keep the arithmetic consistent, "
        "and include no supplementary notes in the #New Problem#."
    )
    SECTIONS = ("#Elements Identified#", "#Plan#", "#New Problem#")


@PROMPT_REGISTRY.register()
class MathQuestionParallelFusionGeneratorPrompt(_FusionBase):
    """Synthesize a novel problem requiring both problems' methods at
    once."""

    ROLE = "Mathematical Problem Synthesizer"
    GUIDELINES = (
        "Step 1: Analyze the core operations, contexts, and reasoning "
        "patterns of both problems, preserving their distinct solution "
        "pathways.\n"
        "Step 2: Find a non-obvious mathematical connection between "
        "them and build one scenario that embeds both contexts (via "
        "sequencing, superposition, or analogy) with hybrid parameters.\n"
        "Step 3: Write the synthesized problem so that solving it "
        "requires applying BOTH original solution strategies, with "
        "cross-domain constraints keeping it consistent with both "
        "sources."
    )
    SECTIONS = ("#Core Elements#", "#Synthesis Method#", "#New Problem#")


@PROMPT_REGISTRY.register()
class MathQuestionConditionFusionGeneratorPrompt(_FusionBase):
    """Combine two problems under a comparison/selection question whose
    answer comes from one of them."""

    ROLE = "Problem Integrator"
    GUIDELINES = (
        "Create one real-world problem whose solution requires solving "
        "both #Problem 1# and #Problem 2# independently, with the FINAL "
        "answer taken from one of them.\n"
        "Step 1: Make sure both problems ask about the same kind of "
        "variable; if not, adjust one so they match.\n"
        "Step 2: Design a unified scenario and a #New Question# that "
        "COMPARES or SELECTS between the two answers (e.g. 'Which plan "
        "is cheaper?', 'Who sells the most items?') rather than "
        "combining them.\n"
        "Step 3: Write the #New Problem# embedding both problems and "
        "the #New Question# in one scenario, without including either "
        "problem's solution or the literal phrases '#Problem 1#'/"
        "'#Problem 2#'."
    )
    SECTIONS = ("#Analysis#", "#New Question#", "#New Problem#")


@PROMPT_REGISTRY.register()
class MathQuestionEvaluatorPrompt(PromptABC):
    """Judge statement completeness/correctness of a math problem;
    output sections #Judgement#: (True/False) and #Explanation#:."""

    def build_system_prompt(self) -> str:
        return ""

    def build_prompt(self, input_question) -> str:
        return (
            "# Role: Mathematics Grading Teacher\n"
            "You are a senior university grader across algebra, "
            "precalculus, number theory, geometry, counting & "
            "probability.\n"
            "## Guidelines\n"
            "Judge the completeness and correctness of the problem "
            "statement below:\n"
            "1. Does the statement give sufficient information, "
            "conditions, and constraints?\n"
            "2. Does it admit multiple interpretations or need "
            "clarification?\n"
            "3. Is the notation and terminology clear?\n"
            "4. Is the problem solvable? If all checks pass output "
            "\"True\" in #Judgement#, otherwise \"False\", and explain "
            "in #Explanation#.\n"
            "## Output Format\n"
            "Reply strictly in this format:\n"
            "#Judgement#:\n"
            "#Explanation#:\n"
            "## Input\n"
            f"{input_question}\n"
            "## Output\n"
        )
