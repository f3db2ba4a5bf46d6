"""Shared persistence for marked markdown report sections.

RECALL.md and SCALING.md each carry sweep sections maintained by a
different tool mode than the one that regenerates the main report; both
sides need the same two operations (extract a `## header` section;
replace-or-append it). One copy here so the section-boundary parsing
cannot drift between the ledgers.
"""

from __future__ import annotations


def extract_section(text: str, header: str) -> str:
    """The `header`-led section of `text` up to the next `## ` heading
    (trailing newline normalized), or '' if absent."""
    i = text.find(header)
    if i < 0:
        return ""
    j = text.find("\n## ", i + 1)
    return (text[i:] if j < 0 else text[i : j + 1]).rstrip() + "\n"


def merge_section(path: str, header: str, section: str) -> None:
    """Replace the `header` section of the file at `path` with `section`,
    or append it if absent (creating the file if needed)."""
    try:
        existing = open(path).read()
    except FileNotFoundError:
        existing = ""
    old = extract_section(existing, header)
    if old:
        existing = existing.replace(old, section)
    else:
        existing = (existing.rstrip() + "\n\n" + section) if existing else section
    with open(path, "w") as fh:
        fh.write(existing)


def carry_section(path: str, header: str, text: str) -> str:
    """Return `text` with the `header` section from the existing file at
    `path` appended — what a main-report regeneration calls to preserve a
    sweep section it does not itself compute."""
    try:
        prior = extract_section(open(path).read(), header)
    except FileNotFoundError:
        prior = ""
    if prior:
        return text.rstrip() + "\n\n" + prior
    return text
