"""Shared persistence for marked markdown report sections.

RECALL.md and SCALING.md each carry sweep sections maintained by a
different tool mode than the one that regenerates the main report; both
sides need the same two operations (extract a `## header` section;
replace-or-append it). One copy here so the section-boundary parsing
cannot drift between the ledgers.
"""

from __future__ import annotations


def _find_section(text: str, header: str) -> tuple[int, int]:
    """(start, end) byte span of the `header`-led section of `text`, or
    (-1, -1) if absent. The header only matches at the start of a line,
    so quoting the header text inside another section's prose is inert."""
    i = -1
    pos = 0
    while True:
        cand = text.find(header, pos)
        if cand < 0:
            return -1, -1
        at_line_start = cand == 0 or text[cand - 1] == "\n"
        line_end = text.find("\n", cand + len(header))
        rest = text[cand + len(header) :] if line_end < 0 else text[cand + len(header) : line_end]
        whole_line = rest.strip() == ""
        if at_line_start and whole_line:
            i = cand
            break
        pos = cand + 1
    j = text.find("\n## ", i + 1)
    return (i, len(text)) if j < 0 else (i, j + 1)


def extract_section(text: str, header: str) -> str:
    """The `header`-led section of `text` up to the next `## ` heading
    (trailing newline normalized), or '' if absent. The header must sit
    at a line start and span the whole line."""
    i, j = _find_section(text, header)
    if i < 0:
        return ""
    return text[i:j].rstrip() + "\n"


def merge_section(path: str, header: str, section: str) -> None:
    """Replace the `header` section of the file at `path` with `section`,
    or append it if absent (creating the file if needed). Splices by span
    index, so only the one anchored section is touched."""
    try:
        existing = open(path).read()
    except FileNotFoundError:
        existing = ""
    i, j = _find_section(existing, header)
    if i >= 0:
        tail = existing[j:]
        existing = existing[:i] + section.rstrip() + "\n" + ("\n" + tail if tail.strip() else tail)
    else:
        existing = (existing.rstrip() + "\n\n" + section) if existing else section
    with open(path, "w") as fh:
        fh.write(existing)


def regen_report(path: str, headers, text: str) -> None:
    """Overwrite the report at `path` with `text`, preserving the existing
    sweep section(s) named by `headers` (one string or a list) by
    appending them in order. Reads the prior file BEFORE opening for
    write — `open(path, "w")` truncates, so inlining this at the call
    site in the wrong order silently drops the sweep sections (round-7
    advice item, both ledgers)."""
    if isinstance(headers, str):
        headers = [headers]
    out = text
    for header in headers:
        out = carry_section(path, header, out)
    with open(path, "w") as fh:
        fh.write(out)


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
