"""Chemistry prompt (reference: dataflow/prompts/chemistry.py:1-37).

Output contract: pure JSON array of monomer objects with keys
abbreviation / full_name / smiles.
"""

from __future__ import annotations

from dataflow_spark.core.prompt import PROMPT_REGISTRY, PromptABC

_DEFAULT_TEMPLATE = (
    "Extract monomer/small-molecule information from the text and "
    "return it as a structured JSON array. For each monomer include "
    "the keys \"abbreviation\", \"full_name\", and \"smiles\"; when a "
    "monomer's information is incomplete, include only the fields that "
    "are present. Example output:\n"
    "[\n"
    "  {\"abbreviation\": \"4-ODA\",\n"
    "   \"full_name\": \"4,4'-Oxydianiline\",\n"
    "   \"smiles\": \"O(c1ccc(N)cc1)c2ccc(cc2)N\"}\n"
    "]\n"
    "Output pure JSON suitable for saving to a .json file — no HTML, "
    "no markdown, no commentary.\n"
)


@PROMPT_REGISTRY.register()
class ExtractSmilesFromTextPrompt(PromptABC):
    """SMILES extraction from literature text, optionally restricted to
    target monomers (the restriction overrides the general rules)."""

    def __init__(self, prompt_template: str | None = None):
        self.prompt_template = prompt_template or _DEFAULT_TEMPLATE

    def build_prompt(self, target_monomers=None) -> str:
        out = self.prompt_template
        if target_monomers:
            names = (", ".join(map(str, target_monomers))
                     if isinstance(target_monomers, (list, tuple))
                     else str(target_monomers))
            out += (
                "\nOnly extract information for these monomers "
                "(identified by abbreviation or full name) — this rule "
                f"takes priority over the general ones: {names}\n")
        return out
