"""Text primitives: normalization, CTC-style collapse, cls argmax, RTL reverse.

Reference parity (cited file:line into /root/reference):
- CTC greedy decode: ppocr/postprocess/rec_postprocess.py:136-190
  (dedup rule :148-152, blank drop via ignored_tokens :189-190,
  empty conf list -> [0] :161-162, mean conf :186).
- ClsPostProcess argmax: ppocr/postprocess/cls_postprocess.py:25-48.
- pred_reverse (Arabic RTL): ppocr/postprocess/rec_postprocess.py:51-65.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from paddleocr_spark.config import LATIN_RUN_CLASS, WS_CLASS

_WS_RE = re.compile(WS_CLASS + "+")
# A maximal latin-ish run, or a single other char (rec_postprocess.py:51-65).
_REVERSE_RUN_RE = re.compile(LATIN_RUN_CLASS + "+|[^a-zA-Z0-9 :*./%+-]")


def normalize_ws(s: str) -> str:
    """Collapse whitespace runs to a single space and strip.

    Mirrored by the Spark expression
    ``trim(regexp_replace(s, WS_CLASS+'+', ' '))``.

    Fast path (exact): when the string has no WS char other than single
    interior spaces, the sub replaces each lone space with itself and
    strip removes nothing — skip both. ~99% of tokenizer calls on heavy
    pages take it (the regex sub was 26% of tokenizer CPU).
    """
    if (
        "\t" in s or "\n" in s or "\r" in s or "\f" in s or "\x0b" in s
        or "  " in s or s[:1] == " " or s[-1:] == " "
    ):
        # strip EXACTLY the WS_CLASS chars: bare .strip() eats all
        # Unicode whitespace (NBSP, ideographic space, ...) which the
        # Spark mirror trim(regexp_replace(s, WS_CLASS+'+', ' ')) does
        # NOT — and whether an NBSP survived then depended on whether
        # an unrelated double space elsewhere forced this slow path
        return _WS_RE.sub(" ", s).strip(" \t\n\r\f\x0b")
    return s


def pred_reverse(pred: str) -> str:
    """Reverse the sequence of runs, keeping latin-ish runs intact.

    Exact port of the *semantics* of rec_postprocess.py:51-65: split into
    maximal [a-zA-Z0-9 :*./%+-] runs and single other characters, then
    reverse the run list. Mirrored in Spark by
    ``array_join(reverse(regexp_extract_all(s, run_pattern, 0)), '')``.
    """
    runs = _REVERSE_RUN_RE.findall(pred)
    return "".join(runs[::-1])


def cls_argmax(probs: list[float], label_list: list[str] | None = None):
    """(label, score) via argmax/max (cls_postprocess.py:25-48).

    ``label_list=None`` -> the index itself is the label, exactly like the
    reference's ``{idx: idx}`` fallback (cls_postprocess.py:30-31).
    np.argmax tie-break = first maximal index, reproduced by max+index.
    """
    m = max(probs)
    idx = probs.index(m)
    label = label_list[idx] if label_list is not None else idx
    return label, m


def ctc_greedy_decode(
    token_ids: list[int],
    token_probs: list[float] | None,
    vocab: list[str],
    blank: int = 0,
) -> tuple[str, float]:
    """CTC greedy decode on an (already argmax'd) token stream.

    rec_postprocess.py:145-190 semantics:
    - ``selection[1:] = ids[1:] != ids[:-1]`` (drop adjacent repeats,
      first token always selected at this step),
    - then drop the blank token everywhere,
    - text = join of vocab chars at selected positions,
    - conf = mean of probs at selected positions; empty -> [0]. In the
      probs-less mode the reference takes ``[1] * len(selection)`` —
      the FULL input length, not the selected subset — so any
      non-empty input decodes with conf 1.0 even when every token is
      dropped (all-blank input).
    """
    n = len(token_ids)
    sel = [True] * n
    for i in range(1, n):
        sel[i] = token_ids[i] != token_ids[i - 1]
    for i in range(n):
        if token_ids[i] == blank:
            sel[i] = False
    chars = [vocab[token_ids[i]] for i in range(n) if sel[i]]
    if token_probs is None:
        # rec_postprocess.py:160: [1] * len(selection) — full length
        confs = [1.0] * n
    else:
        confs = [token_probs[i] for i in range(n) if sel[i]]
    if not confs:
        confs = [0.0]
    # Mean in stream order (np.mean sums left-to-right over the selection).
    total = 0.0
    for c in confs:
        total += c
    return "".join(chars), total / len(confs)


def get_word_info(text: str) -> list[tuple[str, str, int, int]]:
    """Segment a decoded line into class-runs with column positions —
    the get_word_info analog (rec_postprocess.py:70-134): words are
    runs of one char class, with the numeric-'.' and hyphen joining
    rules, and CJK chars standing alone.

    Classes: 'en' ([A-Za-z0-9] runs; '.' joins digit.digit; '-' joins
    alnum-alnum), 'cn' (one CJK char per word), 'sp' (any other
    non-space char, the splitter class). Whitespace delimits and is
    never emitted. Returns [(word, state, col_start, col_end)] with
    end exclusive.
    """
    out: list[tuple[str, str, int, int]] = []
    n = len(text)
    i = 0

    def is_en(c: str) -> bool:
        return c.isascii() and (c.isalnum())

    def is_cjk(c: str) -> bool:
        # U+4E00..U+9FFF, the reference's bound (rec_postprocess.py:94)
        # — NOT ..U+9FA5, which misclassifies the ~90 CJK ideographs
        # added after Unicode 1.0 as 'sp'
        return "一" <= c <= "鿿"

    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if is_cjk(c):
            out.append((c, "cn", i, i + 1))
            i += 1
            continue
        if is_en(c):
            j = i + 1
            while j < n:
                cj = text[j]
                if is_en(cj):
                    j += 1
                elif (
                    cj in ".-"
                    and j + 1 < n
                    and is_en(text[j + 1])
                    and (cj == "-" or (text[j - 1].isdigit() and text[j + 1].isdigit()))
                ):
                    j += 2
                else:
                    break
            out.append((text[i:j], "en", i, j))
            i = j
            continue
        out.append((c, "sp", i, i + 1))
        i += 1
    return out


@dataclass(slots=True)
class Span:
    """A merged output span (one 'text line' analog)."""

    block_id: int
    start: int
    end: int
    score: float  # mean score of the collapsed run = the CTC line conf
    text: str
    parent_id: int  # chunk-split parent block id (== block_id when unsplit)


def ctc_collapse_blocks(blocks) -> list[Span]:
    """CTC-decode analog over an ordered list of kept blocks.

    Each block is a 'token'; its normalized text is the token identity.
    - collapse adjacent duplicates (same normalized text), conf = mean of
      the run's scores in reading order (rec_postprocess.py:148-152,186);
    - drop blank tokens (normalized text == '') after the dedup, exactly
      like blank removal follows repeat removal in the reference
      (selection order at rec_postprocess.py:150-152).

    Implemented as a maximal-run scan (value-identical to the
    flush-per-boundary form it replaced; most runs have length 1 and
    take the copy-free branch — the collapse was ~8% of single-thread
    extract CPU on heavy pages).

    ``blocks`` elements need: block_id, start, end, text, score, parent_id.
    """
    spans: list[Span] = []
    n = len(blocks)
    i = 0
    while i < n:
        first = blocks[i]
        t = first.text
        j = i + 1
        while j < n and blocks[j].text == t:
            j += 1
        if t != "":  # blank token run: dropped, like ignored_tokens
            if j == i + 1:
                spans.append(
                    Span(first.block_id, first.start, first.end,
                         first.score, t, first.parent_id)
                )
            else:
                total = 0.0
                end = first.end
                for b in blocks[i:j]:
                    total += b.score
                    if b.end > end:
                        end = b.end
                spans.append(
                    Span(first.block_id, first.start, end,
                         total / (j - i), t, first.parent_id)
                )
        i = j
    return spans
