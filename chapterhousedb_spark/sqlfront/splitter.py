"""Multi-statement SQL splitting.

The reference accepts SQL files containing multiple ';'-separated
statements and relies on sqlparser to not split on ';' inside string
literals (reference src/planner/test_sqlparser_behavior.rs:6-27 pins
that behavior; src/bin/client_tui.rs:372 feeds whole files). We
reproduce the same contract with a small scanner that understands
single-quoted strings (with '' escapes), double-quoted identifiers,
line comments (--) and block comments (/* */).
"""

from __future__ import annotations


def split_statements(text: str) -> list[str]:
    """Split SQL text on ';' at top level; drop empty statements.

    Comments are preserved inside statements (Spark's parser accepts
    them); a statement that is only comments/whitespace is dropped.
    """
    statements: list[str] = []
    buf: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":  # single-quoted string, '' escapes
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            buf.append(text[i : j + 1])
            i = j + 1
        elif ch == '"':  # double-quoted identifier
            j = text.find('"', i + 1)
            j = n - 1 if j == -1 else j
            buf.append(text[i : j + 1])
            i = j + 1
        elif ch == "-" and text[i : i + 2] == "--":
            j = text.find("\n", i)
            j = n if j == -1 else j
            buf.append(text[i:j])
            i = j
        elif ch == "/" and text[i : i + 2] == "/*":
            j = text.find("*/", i + 2)
            j = n - 2 if j == -1 else j
            buf.append(text[i : j + 2])
            i = j + 2
        elif ch == ";":
            statements.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    statements.append("".join(buf))
    return [s.strip() for s in statements if s.strip() and not _only_comments(s)]


def _only_comments(statement: str) -> bool:
    """True if the statement contains no SQL outside comments."""
    s = statement
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        if s[i : i + 2] == "--":
            j = s.find("\n", i)
            i = n if j == -1 else j + 1
        elif s[i : i + 2] == "/*":
            j = s.find("*/", i + 2)
            i = n if j == -1 else j + 2
        else:
            out.append(s[i])
            i += 1
    return not "".join(out).strip()
