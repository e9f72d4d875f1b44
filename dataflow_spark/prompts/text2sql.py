"""Text2SQL prompt classes (reference:
dataflow/prompts/text2sql.py:1-1682).

Output contracts: correspondence filter → ``<Conclusion> YES/NO
</Conclusion>``; CoT generator and prompt generators → final SQL in a
```sql fenced block; SQL generators → ```sql fenced query and return
``(prompt, complexity)``; question generators → ``[EXPLANATION-START/
END]`` + ``[QUESTION-START/END]`` (+ ``[EXTERNAL-KNOWLEDGE-START/
END]`` for vague/metaphorical styles) and return ``(prompt, style)``.

Where the reference draws styles/complexities with ``random``, this
port derives them deterministically from an md5 of the inputs — same
distributional coverage, engine-reproducible (the repo-wide
determinism contract).
"""

from __future__ import annotations

import hashlib
import json
from typing import List

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC


def _pick(options: list, *seed_parts: str) -> object:
    h = hashlib.md5("||".join(seed_parts).encode()).hexdigest()
    return options[int(h[:8], 16) % len(options)]


@PROMPT_REGISTRY.register()
class Text2SQLCorrespondenceFilterPrompt(PromptABC):
    """Does the SQL answer the question on this schema? Verdict in
    <Conclusion> YES/NO </Conclusion>."""

    def build_prompt(self, question: str, sql: str, db_details: str) -> str:
        return (
            "Decide whether the SQL query below correctly answers the "
            "question, given the schema.\n"
            f"**Question**\n{question}\n"
            f"**SQL**\n```sql\n{sql}\n```\n"
            f"**Schema**\n{db_details}\n"
            "Check: 1. Logical alignment — does the SQL address what "
            "is asked? 2. Schema compliance — are tables, columns, "
            "and joins used correctly? 3. Completeness — are all "
            "conditions from the question captured? 4. Correctness — "
            "any logical errors that would yield a wrong answer?\n"
            "**Output Format**:\n"
            "Give your analysis, then end with the conclusion enclosed "
            "in a code block:\n"
            "<Conclusion> YES/NO </Conclusion>\n"
            "- YES: the SQL correctly implements the question\n"
            "- NO: the SQL has logical errors or misses the question\n"
        )


@PROMPT_REGISTRY.register()
class Text2SQLCotGeneratorPrompt(PromptABC):
    """Step-by-step text-to-SQL chain of thought ending in a ```sql
    block; a colleague's (possibly wrong) reference solution is
    provided."""

    def build_prompt(self, schema_str: str, question: str, sql: str,
                     evidence: str = "") -> str:
        q = question + ("\n" + evidence if evidence else "")
        return (
            "You are a senior data analyst. Translate the natural "
            "language question into an executable SQLite query, "
            "explaining your reasoning step by step. A colleague's "
            "reference solution is included — it may or may not be "
            "correct (watch for wrong columns/joins, wrong "
            "aggregation, or misalignment with the question); use it "
            "only as a hint.\n"
            f"**Schema**\n{schema_str}\n"
            f"**Question**\n{q}\n"
            f"**Reference solution**\n```sql\n{sql}\n```\n"
            "Provide your step-by-step text-to-SQL solution, and "
            "present the final SQL query in a Markdown code block "
            "with syntax highlighting:\n"
            "```sql\n-- final query\n```\n"
        )


class _SelectSQLBase(PromptABC):
    """Shared SQL-synthesis shape: schema + sampled values + target
    complexity → one ```sql query; returns (prompt, complexity)."""

    COMPLEXITY_CRITERIA = {
        "Simple": ("single table, a handful of columns, simple WHERE "
                   "predicates, no joins or nesting"),
        "Moderate": ("one join or a GROUP BY with aggregates, simple "
                     "HAVING/ORDER BY allowed"),
        "Complex": ("multiple joins, subqueries or CTEs, compound "
                    "predicates, aggregation with filtering"),
        "Highly Complex": ("several CTEs or nested subqueries, window "
                           "functions or set operations, multi-level "
                           "aggregation"),
    }
    VECTOR = False

    def build_prompt(self, insert_statements: List[str],
                     create_statements: List[str], db_engine: str):
        schema = "\n\n".join(create_statements)
        complexity = _pick(list(self.COMPLEXITY_CRITERIA), schema,
                           db_engine, str(len(insert_statements)))
        values = ""
        if insert_statements:
            shown = insert_statements[:4]
            values = ("### Database values\nUse these INSERT statements "
                      "to craft realistic WHERE predicates:\n"
                      + "\n\n".join(shown) + "\n")
        vector = ""
        if self.VECTOR:
            vector = (
                "### Vector search\nThe engine supports sqlite-vec "
                "style KNN: `embedding MATCH lembed('<text>') ... "
                "ORDER BY distance LIMIT k`. Prefer a KNN search when "
                "a column is semantically meaningful (descriptions, "
                "names); use ordinary SQL for ids, ages, prices, and "
                "aggregates. Always pair MATCH with LIMIT.\n")
        prompt = (
            f"Write ONE new {complexity} SQL query for the "
            f"{db_engine} database below.\n"
            f"**{complexity}** means: "
            f"{self.COMPLEXITY_CRITERIA[complexity]}.\n"
            f"### Schema\n{schema}\n"
            + values + vector +
            "The query must be executable against this schema and "
            "semantically meaningful. Output the query in a code "
            "block:\n```sql\n-- your query\n```\n"
        )
        return prompt, complexity


@PROMPT_REGISTRY.register()
class SelectSQLGeneratorPrompt(_SelectSQLBase):
    """Complexity-targeted SELECT query synthesis."""


@PROMPT_REGISTRY.register()
class SelectVecSQLGeneratorPrompt(_SelectSQLBase):
    """Complexity-targeted synthesis including vector (KNN/MATCH)
    queries."""

    VECTOR = True


class _QuestionGenBase(PromptABC):
    """Shared SQL→question shape; returns (prompt, style)."""

    STYLES = {
        "Formal": "precise, complete sentences with explicit column "
                  "references",
        "Colloquial": "casual everyday phrasing, as a user would chat",
        "Imperative": "command form ('List…', 'Show…')",
        "Interrogative": "direct question form ('Which…?', 'How "
                         "many…?')",
        "Descriptive": "detailed description with contextual "
                       "information",
        "Concise": "as few words as possible while unambiguous",
        "Vague": "deliberately underspecified; requires external "
                 "knowledge to pin down",
        "Metaphorical": "figurative phrasing; requires external "
                        "knowledge to interpret",
    }
    VECTOR = False

    def _assemble(self, style: str, engine: str, column_info: str,
                  sql: str) -> str:
        with_ek = style in ("Vague", "Metaphorical")
        vec = (", including any vector search operations"
               if self.VECTOR else "")
        out = (
            "[EXPLANATION-START]\n(SQL Explanation)\n[EXPLANATION-END]\n"
            "[QUESTION-START]\n(Natural Language Question)\n"
            "[QUESTION-END]\n")
        if with_ek:
            out += ("[EXTERNAL-KNOWLEDGE-START]\n(External Knowledge)\n"
                    "[EXTERNAL-KNOWLEDGE-END]\n")
        ek_rule = (
            "3. Put the knowledge needed to resolve the vague/"
            "figurative phrasing into the external-knowledge section "
            "as concise semicolon-separated entries.\n" if with_ek
            else "")
        return (
            "**Task Overview**\n"
            "Create a high-quality natural language question for the "
            "SQL query below.\n"
            f"**Style**\nThe question must follow the {style} style: "
            f"{self.STYLES[style]}.\n"
            f"**Database Engine**\n{engine}\n"
            f"**Column Information**\n{column_info}\n"
            f"**SQL Query**\n```sql\n{sql}\n```\n"
            "**Reasoning Steps**\n"
            f"1. Explain in detail what the query does{vec}.\n"
            "2. Formulate the question from the query and "
            "explanation.\n"
            "**Guidelines**\n"
            "1. Name the selected columns faithfully (SELECT * means "
            "'find all …').\n"
            "2. Capture every semantic element: predicates, ORDER BY, "
            "LIMIT.\n"
            + ek_rule +
            "**Output Format**\nStructure your response as:\n" + out
        )

    def build_prompt(self, sql, db_id, db_id2column_info, db_type):
        style = _pick(list(self.STYLES), str(sql), str(db_id))
        cols = db_id2column_info.get(db_id, {}) if db_id2column_info else {}
        used = {c: d for c, d in cols.items()
                if c.lower() in str(sql).lower()}
        prompt = self._assemble(
            style, db_type,
            json.dumps(used, indent=2, ensure_ascii=False), str(sql).strip())
        return prompt, style


@PROMPT_REGISTRY.register()
class Text2SQLQuestionGeneratorPrompt(_QuestionGenBase):
    """SQL → styled natural-language question."""

    def build_prompt(self, sql, db_id, db_id2column_info, db_type):
        return super().build_prompt(sql, db_id, db_id2column_info, db_type)


@PROMPT_REGISTRY.register()
class Text2VecSQLQuestionGeneratorPrompt(_QuestionGenBase):
    """Vector-SQL → styled natural-language question."""

    VECTOR = True

    def build_prompt(self, input_sql, input_db_id, db_id2column_info,
                     db_type):
        return super().build_prompt(input_sql, input_db_id,
                                    db_id2column_info, db_type)


@PROMPT_REGISTRY.register()
class SQLVariationGeneratorPrompt(PromptABC):
    """Transform an SQL query by a deterministic-chosen strategy;
    output in a ```sql block."""

    STRATEGIES = [
        "change the selected columns and aggregation targets",
        "swap or add filter predicates using real data values",
        "restructure joins (add, remove, or reorder tables)",
        "introduce or remove grouping/HAVING logic",
        "rewrite with advanced SQL features (CTEs, window functions, "
        "set operations)",
        "alter ORDER BY / LIMIT semantics",
    ]

    def build_prompt(self, original_sql: str, create_statements: List[str],
                     insert_statements: List[str], db_engine: str) -> str:
        strategy = _pick(self.STRATEGIES, original_sql, db_engine)
        values = ""
        if insert_statements:
            values = (
                "Below are INSERT statements — use them to build "
                "realistic WHERE predicates:\n"
                + "\n\n".join(insert_statements[:4]) + "\n")
        return (
            "Create a new, reasonable, executable SQL query by "
            "transforming the original.\n"
            f"**Original SQL Query**\n```sql\n{original_sql}\n```\n"
            f"**Schema**\n" + "\n\n".join(create_statements) + "\n"
            + values +
            f"**Transformation Instructions**\n{strategy} (target "
            f"engine: {db_engine}).\n"
            "**Output Format**\nEnclose the transformed query in a "
            "code block:\n"
            "```sql\n-- Your transformed SQL query here\n```\n"
        )


@PROMPT_REGISTRY.register()
class Text2SQLPromptGeneratorPrompt(PromptABC):
    """Assemble the inference prompt for text-to-SQL: schema + question
    (+ evidence) → ```sql output contract."""

    def build_prompt(self, db_details: str, question: str,
                     evidence: str = "", db_engine: str = "SQLite") -> str:
        q = f"{evidence}\n{question}" if evidence else question
        return (
            "You are a data science expert. Using the database schema "
            "and the natural language question below, write an "
            f"executable {db_engine} query.\n"
            f"**Schema**\n{db_details}\n"
            f"**Question**\n{q}\n"
            "Rules: return exactly the information asked — no missing "
            "or extra columns; think through the steps before writing "
            "the final query.\n"
            "Output Format:\nEnclose the generated SQL query in a "
            "code block:\n```sql\n-- Your SQL query\n```\n"
            "Take a deep breath and think step by step to find the "
            "correct SQL query."
        )


@PROMPT_REGISTRY.register()
class Text2VecSQLPromptGeneratorPrompt(PromptABC):
    """Assemble the inference prompt for vector-SQL (sqlite-vec style
    KNN with lembed/MATCH/distance)."""

    def build_prompt(self, db_details: str, question: str,
                     evidence: str = "", db_engine: str = "SQLite") -> str:
        q = f"{evidence}\n{question}" if evidence else question
        return (
            "You are a data science expert on a vector-enabled "
            f"{db_engine} database. Using the schema and question "
            "below, write one executable query.\n"
            f"**Schema**\n{db_details}\n"
            f"**Question**\n{q}\n"
            "Vector rules:\n"
            "1. Prefer KNN search (`embedding MATCH lembed('<text>') "
            "... ORDER BY distance LIMIT k`) when the question is "
            "semantic similarity over meaningful text columns; use "
            "ordinary SQL operators for relational columns (ids, "
            "ages, prices) and aggregates.\n"
            "2. `lembed(<string>)` produces a vector matching the "
            "column's type/size; `distance` is the implicit metric "
            "column of a MATCH search.\n"
            "3. Every MATCH must carry a LIMIT — vector engines "
            "(sqlite-vec/vss, pgvector) enforce this and it avoids "
            "runtime errors.\n"
            "Output Format:\nEnclose the generated SQL query in a "
            "code block:\n```sql\n-- Your SQL query\n```\n"
        )
