"""Pure-Python reference oracle: one page -> golden extraction result.

This is the independent implementation the Spark pipeline must match
byte-for-byte (the analog of the reference's golden regression corpus,
test_tipc/compare_results.py + test_tipc/results/*.txt — but with exact
byte equality since our logic is discrete, see SURVEY.md §5).

Stage semantics (each mirrored by Spark-native expressions in
paddleocr_spark/operators/extract.py):
1. detect:   tokenize (core.tokenizer) -> score = (text_len -
   link_text_len) / (text_len + 8)  [box_score_fast analog,
   db_postprocess.py:189-204]
2. filter:   score > det_thresh (segmentation predicate,
   db_postprocess.py:232), then score >= det_box_thresh
   (db_postprocess.py:140-141) and text_len > min_text_len
   (predict_det.py:196-210), then cap max_candidates in document
   order (db_postprocess.py:126).
3. classify: lang-driven orientation analog; p(180)=0.95 for 'ar'
   pages else 0.05; flip iff label=='180' and score>cls_thresh
   (predict_cls.py:119-125, cls_thresh utility.py:125).
4. recognize: CTC collapse of the ordered block-token stream
   (core.text.ctc_collapse_blocks), blank drop, conf = run mean.
5. drop_score: drop spans with conf < drop_score
   (predict_system.py:149-154).
6. assemble: spans joined '\n'; consecutive chunk-spans of the same
   parent joined ' ' (slice-union offset re-basing analog,
   predict_system.py:93-107); 'ar' span text run-reversed
   (pred_reverse, rec_postprocess.py:51-65).
"""

from __future__ import annotations

from dataclasses import dataclass

from paddleocr_spark.config import DEFAULT, PipelineConfig
from paddleocr_spark.core.text import cls_argmax, ctc_collapse_blocks, pred_reverse
from paddleocr_spark.core.tokenizer import Block, tokenize_page


def block_score(text_len: int, link_text_len: int, k: int) -> float:
    # degenerate denominator (empty block under score_k=0): Spark's
    # division yields NULL there and the threshold filter drops the
    # block; -inf makes the Python realization drop it at the same
    # filter instead of raising ZeroDivisionError mid-batch
    den = text_len + float(k)
    if den == 0:
        return float("-inf")
    return (text_len - link_text_len) / den


def block_score_for(b: Block, cfg: PipelineConfig) -> float:
    """Mode-dispatched region score: 'fast' = full-subtree counters
    (box_score_fast, db_postprocess.py:189-204), 'slow' = own-text
    strict membership (box_score_slow, db_postprocess.py:206-225)."""
    if cfg.score_mode == "slow":
        return block_score(b.own_text_len, b.own_link_len, cfg.score_k)
    return block_score(b.text_len, b.link_text_len, cfg.score_k)


@dataclass
class ExtractResult:
    url: str
    extracted_text: str
    spans: list  # list[dict(block_id, start, end, score)]
    n_blocks_detected: int
    n_blocks_kept: int


def cls_probs_for(lang: str) -> list[float]:
    """Deterministic orientation-probability analog: RTL pages 'rotate'."""
    p180 = 0.95 if lang == "ar" else 0.05
    return [1.0 - p180, p180]


def extract_page(
    url: str, html: bytes, lang: str, cfg: PipelineConfig = DEFAULT
) -> ExtractResult:
    blocks = tokenize_page(html, cfg)
    n_detected = len(blocks)

    # 1.-2. score, then segmentation predicate + box threshold + min
    # size, then cap — one fused pass. Blocks are scored IN PLACE
    # (tokenize_page returns fresh instances per call, never shared),
    # which removed the per-block ScoredBlock copy (~9% of
    # single-thread extract CPU on heavy pages). The arithmetic is
    # block_score/block_score_for verbatim — bit-identical floats.
    k = float(cfg.score_k)
    t_det = cfg.det_thresh
    t_box = cfg.det_box_thresh
    t_min = cfg.min_text_len
    kept: list[Block] = []
    if cfg.score_mode == "slow":
        for b in blocks:
            s = block_score(b.own_text_len, b.own_link_len, k)
            b.score = s
            if s > t_det and s >= t_box and b.text_len > t_min:
                kept.append(b)
    else:
        for b in blocks:
            s = block_score(b.text_len, b.link_text_len, k)
            b.score = s
            if s > t_det and s >= t_box and b.text_len > t_min:
                kept.append(b)
    kept = kept[: cfg.max_candidates]

    # 4. CTC collapse + 5. drop_score.
    spans = ctc_collapse_blocks(kept)
    spans = [s for s in spans if s.score >= cfg.drop_score]

    # 3./6. classify (RTL flip) + assembly.
    label, conf = cls_argmax(cls_probs_for(lang), ["0", "180"])
    flip = label == "180" and conf > cfg.cls_thresh
    pieces: list[str] = []
    prev_parent = None
    for s in spans:
        txt = pred_reverse(s.text) if flip else s.text
        if prev_parent is None:
            pieces.append(txt)
        elif s.parent_id == prev_parent:
            pieces.append(" " + txt)
        else:
            pieces.append("\n" + txt)
        prev_parent = s.parent_id
    extracted = "".join(pieces)

    return ExtractResult(
        url=url,
        extracted_text=extracted,
        spans=[
            dict(block_id=s.block_id, start=s.start, end=s.end, score=s.score)
            for s in spans
        ],
        n_blocks_detected=n_detected,
        n_blocks_kept=len(spans),
    )


def detect_blocks_rows(url: str, html: bytes, cfg: PipelineConfig = DEFAULT):
    """golden_blocks rows (FIXTURES.md §3): per-block features + kept flag."""
    rows = []
    for b in tokenize_page(html, cfg):
        s = block_score_for(b, cfg)
        kept = (
            s > cfg.det_thresh
            and s >= cfg.det_box_thresh
            and b.text_len > cfg.min_text_len
        )
        rows.append(
            dict(
                url=url,
                block_id=b.block_id,
                tag=b.tag,
                depth=b.depth,
                start=b.start,
                end=b.end,
                text_len=b.text_len,
                link_text_len=b.link_text_len,
                score=s,
                kept=kept,
                branch=b.branch,
                layout=b.layout,
                parent_id=b.parent_id,
            )
        )
    return rows
