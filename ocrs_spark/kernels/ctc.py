"""CTC decoding (greedy + small beam search), vectorized numpy.

Counterpart of the rten CTC decoder used at
``ocrs/src/recognition.rs:510-514``: label 0 is blank; greedy decode takes
the per-frame argmax, collapses adjacent repeats, drops blanks, and keeps
the frame position of each emitted step.
"""

from __future__ import annotations

import math

import numpy as np


def decode_greedy(logits: np.ndarray) -> list[tuple[int, int]]:
    """``logits``: (seq, classes) log-probs. Returns [(pos, label)] for
    non-blank, non-repeated frames."""
    labels = np.argmax(logits, axis=1)
    prev = np.concatenate(([0], labels[:-1]))
    keep = (labels != 0) & (labels != prev)
    pos = np.nonzero(keep)[0]
    return list(zip(pos.tolist(), labels[pos].tolist()))


def decode_beam(logits: np.ndarray, width: int) -> list[tuple[int, int]]:
    """Prefix beam search over (seq, classes) log-probs. Returns the best
    hypothesis as [(pos, label)] steps. Used for the CLI's ``--beam``
    path (beam width 100, ocrs-cli/src/main.rs:403-407)."""
    logits = np.asarray(logits, dtype=np.float64)
    seq_len, n_classes = logits.shape
    # log-softmax normalize per frame (inputs may already be log-probs;
    # normalizing is idempotent for decoding order).
    mx = logits.max(axis=1, keepdims=True)
    ls = logits - mx
    ls = ls - np.log(np.exp(ls).sum(axis=1, keepdims=True))

    NEG_INF = -math.inf
    # beam entries: prefix (tuple of (pos,label)) -> (logp_blank, logp_nonblank)
    beams = {(): (0.0, NEG_INF)}
    for t in range(seq_len):
        frame = ls[t]
        order = np.argsort(frame)[::-1][: max(width, 1)]
        new_beams: dict = {}

        def add(prefix, pb, pnb):
            opb, opnb = new_beams.get(prefix, (NEG_INF, NEG_INF))
            new_beams[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            for label in order.tolist():
                lp = frame[label]
                if lp == NEG_INF:
                    continue
                if label == 0:
                    add(prefix, total + lp, NEG_INF)
                elif prefix and prefix[-1][1] == label:
                    # Repeat: extends the non-blank path of the same prefix,
                    # or starts a new char after a blank.
                    add(prefix, NEG_INF, pnb + lp)
                    add(prefix + ((t, label),), NEG_INF, pb + lp)
                else:
                    add(prefix + ((t, label),), NEG_INF, total + lp)
        beams = dict(
            sorted(
                new_beams.items(),
                key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]),
                reverse=True,
            )[: max(width, 1)]
        )
    best = max(beams.items(), key=lambda kv: np.logaddexp(kv[1][0], kv[1][1]))
    return list(best[0])
