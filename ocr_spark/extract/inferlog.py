"""Infer-stdout parser (E4): extract OCR text from a model's captured
stdout, reproducing the reference state machine exactly
(/root/reference/app/ocr/deepseek.py:213-262):

* lines containing the 21-char ``=`` marker (without "save") are
  counted; text starts after the second one;
* a non-marker line containing "save results" (case-insensitive) or the
  15-char ``=`` run ends the text section;
* ``BASE:`` / ``PATCHES:`` debug lines are dropped;
* result is newline-joined and stripped.
"""

from __future__ import annotations

MARKER = "=" * 21
BREAKER = "=" * 15


def parse_infer_output(stdout_text: str) -> str:
    lines = stdout_text.split("\n")
    text_lines: list[str] = []
    marker_count = 0
    in_text = False
    for line in lines:
        if MARKER in line and "save" not in line.lower():
            marker_count += 1
            if marker_count >= 2:
                in_text = True
            continue
        if "save results" in line.lower() or BREAKER in line:
            break
        if not in_text:
            continue
        s = line.strip()
        if s.startswith("BASE:") or s.startswith("PATCHES:"):
            continue
        text_lines.append(line)
    return "\n".join(text_lines).strip()
