"""Function-calling data synthesis prompts (reference:
dataflow/prompts/func_call.py:1-521).

Output contracts: scenario/task generators emit bare text (scenario ≤10
words, atomic task ≤30 words); CompositionTaskFilterPrompt ends with
``<ans>yes</ans>``/``<ans>no</ans>``; FuncGeneratePrompt emits a JSON
array of {sub_task, func_list} objects with OpenAI-style function
schemas; conversation prompts use the ``<human>``, ``<observation>``,
``<thought>``, ``<func_call>``, ``<func_return>``, ``<final>`` tags;
ConversationEvalPrompt emits JSON {score, explanation}.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC


@PROMPT_REGISTRY.register()
class ExtractScenarioPrompt(PromptABC):
    """Summarize the life scenario a user-assistant conversation
    represents; concise bare-text output."""

    def build_prompt(self, conversation: str) -> str:
        return (
            "Read the conversation between a user and an assistant "
            "below and identify the general life scenario it "
            "represents. Reply with a concise description of the "
            "scenario type only — no analysis of the specific "
            "exchange.\n"
            f"{conversation}\n"
            "Concise Overview of the Scenario:"
        )


@PROMPT_REGISTRY.register()
class ExpandScenarioPrompt(PromptABC):
    """Mutate a scenario into a substantially different but realistic
    one; ≤10 words, same format as the original."""

    def build_prompt(self, scenario: str) -> str:
        return (
            "Given the daily scenario below, invent a NEW, entirely "
            "different scenario. Requirements: you may change the "
            "action or the subject; the new scenario must differ "
            "substantially from the original; it must be realistic and "
            "feasible in daily life; keep the same format as the "
            "original; limit your reply to 10 words and output only "
            "the new scenario.\n"
            f"Original Scenario:\n{scenario}\n"
            "Modified Scenario:"
        )


@PROMPT_REGISTRY.register()
class FuncAtomicTaskGeneratePrompt(PromptABC):
    """One-step atomic task grounded in a scenario; ≤30 words, fully
    self-contained, no tool mentions."""

    def build_prompt(self, scenario: str) -> str:
        return (
            "You are creating training tasks for a model that maps a "
            "user's task description to a sequence of function calls. "
            "Given the scenario below, write ONE basic atomic task: a "
            "reasonable real-life task completable in a single step. "
            "Spell out any information, criteria, or constraints you "
            "mention (no references to personal information or prior "
            "knowledge); make the description detailed and free of "
            "ambiguity; do NOT name specific tools or functions; limit "
            "the description to 30 words. Output only the task text, "
            "with no extra notation.\n"
            f"Given Scenario:\n{scenario}\n"
        )


@PROMPT_REGISTRY.register()
class SequentialTaskGeneratePrompt(PromptABC):
    """Chain a subsequent task onto a given task (output feeds input)."""

    def build_prompt(self, task: str) -> str:
        return (
            "You are creating complex multi-step tasks for "
            "function-calling training. Given the task below, add one "
            "SUBSEQUENT task such that: it consumes the given task's "
            "output as input; it can only run after the given task "
            "completes; together they form a coherent composition "
            "task. Output only the subsequent task description in the "
            "same format as the given task.\n"
            f"Given Task:\n{task}\n"
        )


@PROMPT_REGISTRY.register()
class ParathenSeqTaskGeneratePrompt(PromptABC):
    """Add a parallel task plus a subsequent task that joins both
    outputs."""

    def build_prompt(self, task: str) -> str:
        return (
            "You are creating complex multi-step tasks for "
            "function-calling training. Given the task below, add (a) "
            "one PARALLEL task — related to the given task but with "
            "input independent of its output, runnable at the same "
            "time — and (b) one SUBSEQUENT task that consumes the "
            "outputs of BOTH the given and the parallel task and can "
            "only run after both complete. The three together must "
            "form a coherent composition task. Output the parallel "
            "task and then the subsequent task, in the same format as "
            "the given task.\n"
            f"Given Task:\n{task}\n"
        )


@PROMPT_REGISTRY.register()
class CompositionTaskFilterPrompt(PromptABC):
    """Check that a task breakdown suffices for its composition task;
    verdict enclosed in <ans></ans>."""

    def build_prompt(self, task: str, sub_tasks: str) -> str:
        return (
            "You are an expert in task decomposition. Decide whether "
            "the sub-tasks below are sufficient to complete the "
            "composition task.\n"
            f"Composition task:\n{task}\n"
            f"Potential task breakdown:\n{sub_tasks}\n"
            "Give your analysis first, then your final verdict "
            "enclosed in <ans> tags: <ans>yes</ans> or <ans>no</ans>."
        )


@PROMPT_REGISTRY.register()
class FuncGeneratePrompt(PromptABC):
    """Design reusable function schemas for each sub-task; JSON array
    output of {sub_task, func_list} with OpenAI-style schemas."""

    def build_prompt(self, task: str, sub_tasks: str) -> str:
        return (
            "You are designing functions for a function-calling "
            "model. Given the composition task and its breakdown "
            "below, define the functions needed to accomplish each "
            "sub-task. Rules: functions must be GENERIC and reusable "
            "for future tasks, not tailored to this one; one function "
            "does one thing (no conflated multi-purpose functions); a "
            "sub-task may need zero, one, or several functions — pure "
            "logic/comparison/set-operation sub-tasks need none (empty "
            "func_list); sequentially-called functions must compose "
            "(the first one's output feeds the next).\n"
            f"Composition task:\n{task}\n"
            f"Task breakdown:\n{sub_tasks}\n"
            "Output a JSON array, one object per sub-task:\n"
            "[\n"
            "  {\n"
            '    "sub_task": "a sub task from the task breakdown",\n'
            '    "func_list": [\n'
            "      {\n"
            '        "name": "<function name>",\n'
            '        "description": "<function usage description>",\n'
            '        "parameters": {"<param1>": {"type": "<string|'
            'number|boolean|array|object>", "description": "<param1 '
            'description>"}},\n'
            '        "required": ["<required parameter names>"],\n'
            '        "responses": {"<res1>": {"type": "<res1 type>", '
            '"description": "<res1 description>"}}\n'
            "      }\n"
            "    ]\n"
            "  }\n"
            "]\n"
            "Output only the JSON."
        )


@PROMPT_REGISTRY.register()
class ConversationUserPrompt(PromptABC):
    """Role-play the user side of a tool-use conversation; every output
    wrapped in <human></human> tags."""

    def build_prompt(self, task: str) -> str:
        return (
            "Role-play a USER working with an AI assistant in a "
            "multi-turn tool-use conversation. Your goal is the "
            "predefined task below, which needs multiple steps and "
            "function calls to complete.\n"
            f"**Task**\n{task}\n"
            "Take an active role: explain the task in detail, supply "
            "any data the assistant needs when asked, and react to "
            "its progress like a real person would. Wrap EVERY one of "
            "your outputs in the <human> tag, e.g. "
            "<human> ... </human>."
        )


@PROMPT_REGISTRY.register()
class ConversationAssistantPrompt(PromptABC):
    """Role-play the assistant: observation → thought → func_call →
    final, using the tagged protocol."""

    def build_prompt(self, sub_task: str, sub_task_func: str) -> str:
        return (
            "Role-play an AI ASSISTANT that solves the user's task by "
            "calling the available functions. You already know the "
            "task decomposition and the functions for each sub-task.\n"
            f"**Subtasks**\n{sub_task}\n"
            f"**Available Functions for Subtasks**\n{sub_task_func}\n"
            "The user's messages arrive in <human> tags; function "
            "results arrive in <func_return> tags (check them for "
            "errors — they are not always correct). Use the available "
            "functions as much as possible.\n"
            "Your response must obey this format:\n"
            "<observation> what you observe from the user's message "
            "and any function output </observation>\n"
            "<thought> your reasoning about the next step </thought>\n"
            "<func_call>[{\"name\": \"<function>\", \"arguments\": "
            "{...}}] </func_call> — arguments must match the "
            "function's schema; several calls may share one list\n"
            "When the task is complete, give the final answer inside "
            "<final> ... </final>."
        )


@PROMPT_REGISTRY.register()
class ConversationToolPrompt(PromptABC):
    """Role-play the tool runtime: answer a <func_call> with a JSON
    result inside <func_return>."""

    def build_prompt(self, function: str) -> str:
        return (
            "Role-play the TOOL RUNTIME for the function described "
            "below. When you receive a <func_call>, return plausible "
            "execution results as pure JSON inside a <func_return> "
            "tag — no irrelevant text. Example:\n"
            "<func_call>{\"name\": \"get_weather\", \"arguments\": "
            "{\"city\": \"New York\"}}</func_call>\n"
            "<func_return>{\"temperature\": \"25C\"}</func_return>\n"
            f"Function description:\n{function}\n"
        )


@PROMPT_REGISTRY.register()
class ConversationEvalPrompt(PromptABC):
    """Score a tool-use conversation 1-5 on tool-usage correctness and
    logic; strict JSON {score, explanation} output."""

    def build_prompt(self, conversation: str) -> str:
        return (
            "You will be given only the conversation content (a list "
            "of messages with role and content), possibly containing "
            "<observation>, <thought>, <func_call>, <func_return>, "
            "and <final> tags. Assign a quality score from 1 to 5 "
            "based solely on the correctness and logical flow of tool "
            "usage. Output strictly JSON, nothing else:\n"
            "{\n"
            '  "score": <int from 1 to 5>,\n'
            '  "explanation": "<short reasoning>"\n'
            "}\n"
            "Now evaluate this conversation:\n"
            f"<conversation>\n{conversation}\n</conversation>\n"
        )
