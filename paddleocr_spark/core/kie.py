"""KIE analog: entity classification (SER) + key-value linking (RE).

The reference's KIE stage labels token spans as QUESTION/ANSWER
entities (SerRePredictor, ppstructure/kie/predict_kie_token_ser_re.py:
40-84) and then pairs heads with tails (`decode_pred`,
ppocr/postprocess/vqa_token_re_layoutlm_postprocess.py:37-76). The
DOM analog: heading-like blocks are *keys*; content blocks are
*values*; each value links to the nearest preceding key in reading
order — the document-outline pairing a training-data pipeline uses to
carry section context with each extracted paragraph.

Two equivalent implementations, parity-tested:
- this pure-Python form (runs in the oracle and per-document tests);
- a native window expression over the exploded blocks table
  (`last(key_id, ignorenulls) over (partition by url order by
  block_id)`) — the as-of pattern, one shuffle on url, no join.
"""

from __future__ import annotations

KEY_TAGS = frozenset({"h1", "h2", "h3"})
MAX_KEY_LEN = 60  # a trailing-colon block this short also acts as a key


def entity_label(tag: str, text: str) -> str:
    """'key' | 'value' | 'other' for one block (SER analog)."""
    if tag in KEY_TAGS:
        return "key"
    if text.endswith(":") and len(text) <= MAX_KEY_LEN:
        return "key"
    if text:
        return "value"
    return "other"


def link_key_values(blocks) -> list[tuple[int, int | None]]:
    """RE analog over reading-ordered blocks: [(value_block_id,
    governing_key_block_id | None)]. Blocks must be in emission
    (reading) order; a value before any key links to None."""
    out: list[tuple[int, int | None]] = []
    current_key: int | None = None
    for b in blocks:
        lbl = entity_label(b.tag, b.text)
        if lbl == "key":
            current_key = b.block_id
        elif lbl == "value":
            out.append((b.block_id, current_key))
    return out
