"""Continuous-batching AR serving engine (iteration-level scheduling).

Beyond-parity framework component: the reference serves MMU requests one
batch at a time (inference_mmu.py loops over prompts; a static batch must
run to the LONGEST request's budget, wasting every finished lane's decode
steps).  This engine keeps a fixed set of batch lanes ("slots"), each
holding an independent request at its own sequence length, and refills a
lane the moment its request finishes — the device never decodes a lane
that has no work beyond chunk granularity.

TPU-shaped design decisions:
  * One compiled decode-step program for ALL slots: per-lane lengths ride
    in as an int32 [slots] vector (KVCache.length), per-lane cache writes
    are a vmapped dynamic_update_slice (models/phi.py::_cache_scatter),
    and the attention bias is computed from the lengths vector — no
    recompilation as requests come and go.
  * Chunked scheduling: decode runs ``chunk`` steps per dispatch inside a
    lax.scan.  Host<->device latency (the usual continuous-batching tax)
    is amortized over chunk*slots tokens; scheduling decisions happen at
    chunk boundaries.  chunk=8-16 keeps the scheduling quantum small
    relative to typical generation budgets while making dispatch overhead
    negligible.
  * Prefill compiles once per prompt-length bucket (prompts right-padded
    to the bucket; padded key columns are bias-masked and their K/V rows
    are overwritten as decode advances, so padding is invisible).
  * The KV cache buffers are donated through every dispatch: XLA updates
    them in place, nothing is reallocated per chunk.

The engine core is model-agnostic (prefill/decode callables); the
ShowoMMUServer adapter wires it to the v1 Show-o MMU path (cacheless
reference loop: models/modeling_showo.py:183-240).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from showo_tpu.ops.masks import NEG_INF


@dataclasses.dataclass
class Request:
    """One generation request."""

    uid: int
    prompt: np.ndarray                  # int32 [S] ids, or [S, D] embeds
    max_new_tokens: int
    meta: tuple = ()                    # extra per-request prefill args
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None


def _round_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class ContinuousBatchingEngine:
    """Model-agnostic slot scheduler.

    prefill_for(bucket) -> fn(cache_k, cache_v, padded [1, bucket, ...],
        true_len, slot, key, *request_meta)
        -> (cache_k, cache_v, first_token scalar)
    decode_chunk: fn(cache_k, cache_v, lengths [slots], tok [slots], key)
        -> (cache_k, cache_v, lengths, tok, key,
            toks [chunk, slots, T], nvalid [chunk, slots])
        where toks[c, s, :nvalid[c, s]] are the tokens lane s SAMPLED at
        step c (T == max_tokens_per_step: 1 for plain AR decode, k+1 for
        speculative decode where up to k drafted tokens verify per step).

    The host syncs with the device exactly once per scheduling round
    (one jax.device_get covering the chunk's tokens AND any prefill
    first-tokens dispatched this round) — per-dispatch blocking reads
    would pay a full host<->device round trip each, which dominates
    wall time on remote-device links.
    """

    def __init__(self, *, slots: int, cap: int, chunk: int,
                 prefill_for: Callable[[int], Callable],
                 decode_chunk: Callable,
                 init_cache: Callable[[], Any],
                 buckets: Sequence[int],
                 eot_token: Optional[int] = None,
                 lookahead: int = 4,
                 max_tokens_per_step: int = 1,
                 fused_admit_for: Optional[Callable[[int], Callable]] = None,
                 alt_decode_chunk: Optional[Callable] = None,
                 alt_max_tokens_per_step: int = 1,
                 probe_windows: int = 1):
        self.slots, self.cap, self.chunk = slots, cap, chunk
        self.lookahead = max(1, lookahead)
        self.max_tokens_per_step = max(1, max_tokens_per_step)
        self.buckets = sorted(buckets)
        self._prefill_for = prefill_for
        self._prefill_cache: Dict[int, Callable] = {}
        self._decode_chunk = decode_chunk
        # adaptive A/B between two decode programs (e.g. speculative vs
        # plain under temperature sampling, where draft acceptance — and
        # thus whether speculation pays — depends on the weights and the
        # workload): measure the alt (safe baseline) then the primary
        # over ``probe_windows`` windows each (a window is discarded as
        # compile-warmup only the FIRST time a given program ever runs;
        # candidate windows are capped to one chunk), then commit to the
        # measured winner.  reset_ab() restarts probation.
        self._alt_decode_chunk = alt_decode_chunk
        self._alt_mts = max(1, alt_max_tokens_per_step)
        self._probe_windows = max(1, probe_windows)
        self.ab_choice: Optional[str] = None   # "primary" | "alt" when done
        self._ab = None
        if alt_decode_chunk is not None:
            self.reset_ab()
        # fused admission (serving/fused_admit.py): prefill a new request
        # inside one decode step so admissions stop stalling decode lanes;
        # used whenever at least one lane is mid-decode, plain prefill
        # otherwise (initial fill)
        self._fused_admit_for = fused_admit_for
        self._fused_cache: Dict[int, Callable] = {}
        self.eot_token = eot_token
        ck, cv = init_cache()
        self.cache_k, self.cache_v = ck, cv
        self.lengths = np.zeros(slots, np.int32)   # host-tracked
        self.cur_tok = jnp.zeros(slots, jnp.int32)  # device-resident
        self.active: List[Optional[Request]] = [None] * slots
        self.queue: deque = deque()
        self._pending: List = []   # (slot, request, device tok0) to sync
        self._events: List = []    # (active snapshot, device toks [slots])
        #                            per fused-admit decode step, in order
        self._unsynced = np.zeros(slots, np.int64)  # device tokens not yet
        #                                             appended, per lane
        self._uid = 0
        self.stat_steps = 0        # decode steps dispatched (all lanes)

    # -- client API ---------------------------------------------------

    def submit(self, prompt: np.ndarray, max_new_tokens: int,
               meta: tuple = ()) -> Request:
        prompt = np.asarray(prompt)
        if prompt.ndim == 1:            # token ids; embeds keep their dtype
            prompt = prompt.astype(np.int32)
        r = Request(self._uid, prompt, int(max_new_tokens), meta=tuple(meta),
                    submitted_at=time.perf_counter())
        self._uid += 1
        self.queue.append(r)
        return r

    def run(self, key: jax.Array) -> List[Request]:
        """Drain the queue; returns all completed requests."""
        finished: List[Request] = []
        while self.queue or any(r is not None for r in self.active):
            key = self._fill_slots(key)
            key = self._decode_once(key, finished)
        return finished

    # -- internals ----------------------------------------------------

    def reset_ab(self) -> None:
        """(Re)start decode-program probation (see __init__).

        Probation is deliberately cheap: phase 0 measures the ALT (safe
        baseline, e.g. plain decode) first, phase 1 the primary (e.g.
        speculative); probe windows are capped to ONE chunk so a slow
        candidate is exposed for at most ~(1 + probe_windows) * chunk
        steps; a window is discarded as compile-warmup only the first
        time a given program EVER runs (not once per phase)."""
        if self._alt_decode_chunk is None:
            return
        self._ab = {"phase": 0, "left": self._probe_windows,
                    "stats": [[0, 0.0], [0, 0.0]]}
        if not hasattr(self, "_prog_runs"):
            self._prog_runs = [0, 0]     # [alt, primary] window counts
        self.ab_choice = None
        self.ab_trace = []               # (prog_idx, n, emitted, secs)

    def force_ab(self, choice: str) -> None:
        """Commit the A/B immediately (warmup helper: lets benches
        exercise choice-gated programs, e.g. fused admission, off the
        clock; reset_ab() afterwards restarts real probation)."""
        if self._ab is not None:
            self._ab["phase"] = 2
            self.ab_choice = choice

    def _ab_current(self):
        """(decode_chunk, max_tokens_per_step, prog_idx) for this window;
        prog_idx: 0 = alt, 1 = primary."""
        primary = (self._decode_chunk, self.max_tokens_per_step, 1)
        alt = (self._alt_decode_chunk, self._alt_mts, 0)
        if self._ab is None:
            return primary
        ph = self._ab["phase"]
        if ph == 0:
            return alt
        if ph == 1:
            return primary
        return primary if self.ab_choice == "primary" else alt

    def _ab_record(self, prog_idx: int, emitted: int, seconds: float
                   ) -> None:
        if self._ab is None:
            return
        if len(self.ab_trace) < 200:
            self.ab_trace.append((prog_idx, emitted, round(seconds, 4)))
        first_run = self._prog_runs[prog_idx] == 0
        self._prog_runs[prog_idx] += 1
        st = self._ab
        if st["phase"] >= 2:
            return
        if first_run:
            return                       # compile-warmup window
        st["stats"][st["phase"]][0] += emitted
        st["stats"][st["phase"]][1] += seconds
        st["left"] -= 1
        if st["left"] == 0:
            if st["phase"] == 0:
                st.update(phase=1, left=self._probe_windows)
                return
            (t_alt, s_alt), (t_pri, s_pri) = st["stats"]
            r_alt = t_alt / max(s_alt, 1e-9)
            r_pri = t_pri / max(s_pri, 1e-9)
            self.ab_choice = "primary" if r_pri >= r_alt else "alt"
            st["phase"] = 2

    def _prefill(self, bucket: int) -> Callable:
        if bucket not in self._prefill_cache:
            self._prefill_cache[bucket] = self._prefill_for(bucket)
        return self._prefill_cache[bucket]

    def _fused(self, bucket: int) -> Callable:
        if bucket not in self._fused_cache:
            self._fused_cache[bucket] = self._fused_admit_for(bucket)
        return self._fused_cache[bucket]

    def _fill_slots(self, key: jax.Array) -> jax.Array:
        # dispatch-only: the prefill first-token stays on device (no
        # blocking read here); _decode_once fetches it together with the
        # chunk's tokens in one device_get
        for s in range(self.slots):
            if self.active[s] is not None or not self.queue:
                continue
            r = self.queue.popleft()
            S = len(r.prompt)
            # overshoot margin: without EOT the lookahead window is sized
            # so a lane never finishes before the window's last chunk
            # (ceil for plain decode, full-acceptance floor for
            # speculative), so overshoot stays under one chunk of steps;
            # EOT finishes are unpredictable and the full window can run on
            per_chunk = self.chunk * self.max_tokens_per_step
            margin = (per_chunk if self.eot_token is None
                      else per_chunk * self.lookahead)
            if self._fused_admit_for is not None:
                margin += self.slots   # fused admits advance decode between
                #                        windows, before the host can react
            if S + r.max_new_tokens + margin > self.cap:
                raise ValueError(
                    f"request {r.uid}: prompt {S} + budget "
                    f"{r.max_new_tokens} does not fit cap {self.cap}")
            bucket = _round_bucket(S, self.buckets)
            padded = np.zeros((1, bucket) + r.prompt.shape[1:],
                              r.prompt.dtype)
            padded[0, :S] = r.prompt
            # fused admission composes with PLAIN decode (its decode half
            # pays per-step cache materialization the spec chunk-local
            # program avoids) — under adaptive A/B it activates once the
            # controller commits to the alt/plain program
            fused_ok = self._fused_admit_for is not None and (
                self._ab is None or self.ab_choice == "alt")
            if fused_ok and any(a is not None for a in self.active):
                # fused admission: prefill rides one decode step's weight
                # stream — decode lanes advance one token instead of
                # stalling for the standalone prefill program
                for s2 in range(self.slots):
                    if self.active[s2] is None:
                        self.lengths[s2] = 0
                key, k1, k2 = jax.random.split(key, 3)
                snapshot = list(self.active)
                (self.cache_k, self.cache_v, self.cur_tok, toks,
                 tok0) = self._fused(bucket)(
                    self.cache_k, self.cache_v, jnp.asarray(self.lengths),
                    self.cur_tok, jnp.asarray(padded),
                    jnp.asarray(S, jnp.int32), jnp.asarray(s, jnp.int32),
                    k1, k2, *r.meta)
                # lengths advance host-deterministically: +1 per active
                # lane, admitted lane = prompt length
                for s2, r2 in enumerate(snapshot):
                    if r2 is not None:
                        self.lengths[s2] += 1
                        self._unsynced[s2] += 1
                self.lengths[s] = S
                self.active[s] = r
                self._events.append((snapshot, toks))
                self._pending.append((s, r, tok0))
                self._unsynced[s] += 1
                self.stat_steps += 1
                continue
            key, k1 = jax.random.split(key)
            self.cache_k, self.cache_v, tok0 = self._prefill(bucket)(
                self.cache_k, self.cache_v, jnp.asarray(padded),
                jnp.asarray(S, jnp.int32), jnp.asarray(s, jnp.int32), k1,
                *r.meta)
            self.lengths[s] = S
            self.cur_tok = self.cur_tok.at[s].set(tok0)
            self.active[s] = r
            self._pending.append((s, r, tok0))
            self._unsynced[s] += 1
        return key

    def _finish_check(self, r: Request, now: float) -> bool:
        if (self.eot_token is not None and r.tokens
                and r.tokens[-1] == self.eot_token):
            r.done = True
        if len(r.tokens) >= r.max_new_tokens:
            r.done = True
        if r.done:
            r.finished_at = now
        return r.done

    def _decode_once(self, key: jax.Array, finished: List[Request]
                     ) -> jax.Array:
        if not any(r is not None for r in self.active):
            return key
        # idle lanes decode garbage; pin their length to 0 so they never
        # overflow the cache capacity
        for s in range(self.slots):
            if self.active[s] is None:
                self.lengths[s] = 0
        snapshot = list(self.active)
        pend, self._pending = self._pending, []
        events, self._events = self._events, []
        # budget-aware lookahead: finishing times are host-predictable
        # (modulo EOT / speculative acceptance), so dispatch enough chunks
        # that the earliest-finishing lane still works through the
        # window's LAST chunk — zero added idle, 1/n the sync roundtrips.
        # _unsynced counts device-side tokens (prefill first-tokens +
        # fused-admit decode tokens) not yet appended to r.tokens.
        rem = [r.max_new_tokens - len(r.tokens) - int(self._unsynced[s])
               for s, r in enumerate(snapshot) if r is not None]
        self._unsynced[:] = 0
        dec, mts, prog_idx = self._ab_current()
        denom = self.chunk * mts
        if mts == 1:
            n = max(1, min(self.lookahead, -(-max(1, min(rem)) // denom)))
        else:  # acceptance varies: floor = conservative window
            n = max(1, min(self.lookahead, max(1, min(rem)) // denom))
        if self._ab is not None and self._ab["phase"] == 1:
            n = 1        # short candidate-probe windows: bound exposure
        toks_parts, nvalid_parts = [], []
        t_window = time.perf_counter()
        # first dispatch uploads the host lengths (refills / idle-lane
        # pins); later window dispatches consume the device-returned lens
        # directly — slot state cannot change mid-window, so nothing
        # blocks until the sync below
        lens = jnp.asarray(self.lengths)
        for i in range(n):
            key, k1 = jax.random.split(key)
            (self.cache_k, self.cache_v, lens, cur, _, toks,
             nvalid) = dec(
                self.cache_k, self.cache_v, lens, self.cur_tok, k1)
            self.cur_tok = cur             # stays on device
            toks_parts.append(toks)
            nvalid_parts.append(nvalid)
            self.stat_steps += self.chunk
        # THE sync point: window tokens + final lengths + any prefill
        # first-tokens + fused-admit decode tokens, one read
        host = jax.device_get((lens,) + tuple(toks_parts)
                              + tuple(nvalid_parts)
                              + tuple(t for _, _, t in pend)
                              + tuple(t for _, t in events))
        lens_h = host[0]
        toks_h = np.concatenate(host[1:1 + n], axis=0)  # [n*chunk, slots, T]
        nvalid_h = np.concatenate(host[1 + n:1 + 2 * n], axis=0)
        tok0s = host[1 + 2 * n:1 + 2 * n + len(pend)]
        event_toks = host[1 + 2 * n + len(pend):]
        for s in range(self.slots):
            if snapshot[s] is not None:
                self.lengths[s] = lens_h[s]
        now = time.perf_counter()
        # chronological per lane: an admitted lane's tok0 precedes any
        # fused-admit step token it produced (it was idle during its own
        # admission step), which precede the window's tokens
        for (s, r, _), t0 in zip(pend, tok0s):
            r.first_token_at = now
            r.tokens.append(int(t0))
            if self._finish_check(r, now):
                finished.append(r)
                self.active[s] = None
        for (esnap, _), etoks in zip(events, event_toks):
            for s, r in enumerate(esnap):
                if r is None or r.done:
                    continue
                r.tokens.append(int(etoks[s]))
                if self._finish_check(r, now):
                    finished.append(r)
                    self.active[s] = None
        emitted = 0
        for s in range(self.slots):
            r = snapshot[s]
            if r is None or r.done:
                continue
            for c in range(toks_h.shape[0]):
                for t in toks_h[c, s, :nvalid_h[c, s]]:
                    r.tokens.append(int(t))
                    emitted += 1
                    if self._finish_check(r, now):
                        break
                if r.done:
                    break
            if r.done:
                finished.append(r)
                self.active[s] = None
        self._ab_record(prog_idx, emitted, now - t_window)
        return key


class ShowoMMUServer:
    """v1 Show-o MMU continuous-batching adapter.

    Builds the compiled prefill/decode programs over showo_forward with
    per-lane cache offsets.  Sampling params are static (compiled in).
    """

    def __init__(self, cfg, params, *, slots: int = 8, cap: int = 512,
                 chunk: int = 16, buckets: Sequence[int] = (320, 384, 448),
                 temperature: float = 1.0, top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 eot_token: Optional[int] = None, lookahead: int = 4,
                 speculative_k: int = 0,
                 spec_chunk_local: bool = True,
                 fused_admit: Optional[bool] = None,
                 kv_int8: bool = False,
                 spec_adaptive: bool = True):
        from showo_tpu.models.phi import KVCache
        from showo_tpu.models.showo import showo_forward
        from showo_tpu.ops.masks import omni_mask_mmu
        from showo_tpu.sampling.ar import _sample_logits
        from showo_tpu.serving.decode_chunk import (kv_cache_write,
                                                    kv_cache_zeros)

        self.cfg, self.params = cfg, params
        dtype = params["showo"]["embed"].dtype
        L = cfg.llm.num_layers
        H, Dh = cfg.llm.num_heads, cfg.llm.head_dim
        eoi = cfg.llm_vocab_size + 2          # [EOI] id in the unified vocab

        # int8 KV cache (decode_chunk.py helpers): halves the cache's HBM
        # stream during decode; requires the chunk-local decode paths
        # (plain + speculative) — the fused-admission step writes bf16
        # rows in-scan and stays unsupported
        if kv_int8:
            if fused_admit:
                raise ValueError("kv_int8 requires fused_admit=False")
            fused_admit = False
            if speculative_k and not spec_chunk_local:
                raise ValueError("kv_int8 requires spec_chunk_local=True")

        def init_cache():
            shape = (L, slots, cap, H, Dh)
            return (kv_cache_zeros(shape, kv_int8, dtype),
                    kv_cache_zeros(shape, kv_int8, dtype))

        # params ride as a jit ARGUMENT (bound at call time), never a
        # closure capture: closed-over weights would be baked into every
        # compiled program as constants (~GBs duplicated per bucket)
        def make_prefill(bucket: int):
            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def prefill(params, cache_k, cache_v, padded, true_len, slot,
                        key):
                tmp = KVCache.zeros(cfg.llm, 1, bucket, dtype=dtype)
                bias = omni_mask_mmu(padded, eoi_id=eoi, dtype=dtype)
                cols = jnp.arange(bucket)[None, None, None, :]
                bias = jnp.where(cols < true_len, bias, NEG_INF)
                logits, tc = showo_forward(cfg, params, input_ids=padded,
                                           attention_bias=bias, cache=tmp)
                cache_k = kv_cache_write(cache_k, tc.k, (0, slot, 0, 0))
                cache_v = kv_cache_write(cache_v, tc.v, (0, slot, 0, 0))
                last = jax.lax.dynamic_index_in_dim(
                    logits[0], true_len - 1, axis=0, keepdims=False)
                tok0 = _sample_logits(key, last[None], temperature, top_k,
                                      None, top_p)[0]
                return cache_k, cache_v, tok0

            return lambda *a: prefill(self.params, *a)

        # chunk-local fresh-KV decode (serving/decode_chunk.py): the big
        # cache stays loop-invariant across the chunk's steps, fresh rows
        # accumulate in a ~13 MB side buffer and scatter once per chunk —
        # the naive per-step cache materialization was 60% of the step
        # (16.0 -> 6.5 ms/step measured, tools/probe_decode_cache_copy.py)
        from showo_tpu.serving.decode_chunk import build_v1_decode_chunk

        decode_wrapper = build_v1_decode_chunk(
            self, cfg, dtype=dtype, cap=cap, chunk=chunk,
            temperature=temperature, top_k=top_k, top_p=top_p, slots=slots)
        alt_decode = None
        if speculative_k:
            # prompt-lookup speculative decoding (speculative.py): greedy
            # (top_k=1) is token-exact vs plain greedy decode; any other
            # sampling config routes through rejection resampling and is
            # distribution-exact
            from showo_tpu.serving.speculative import build_v1_speculative

            # under temperature sampling, point-mass drafts only pay off
            # when acceptance is high (weights/workload dependent): keep
            # the plain chunk program as the A/B alternative and let the
            # engine commit to whichever measures faster (never-regress
            # guarantee — both sample the same filtered distribution)
            greedy = top_k == 1 and (top_p is None or top_p >= 1.0)
            if spec_adaptive and not greedy:
                alt_decode = decode_wrapper
            self.buf = jnp.zeros((slots, cap), jnp.int32)
            make_prefill, decode_wrapper = build_v1_speculative(
                self, cfg, dtype=dtype, eoi=eoi, cap=cap, chunk=chunk,
                draft_k=speculative_k, temperature=temperature,
                top_k=top_k, top_p=top_p, chunk_local=spec_chunk_local)

        # fused admission (prefill inside a decode step, fused_admit.py):
        # default ON for the plain path with fuse_parallel_mlp params.  In
        # speculative mode the admission rides a PLAIN fused decode step
        # (one sampled token per active lane, no drafting that step) and
        # the draft ring records the step afterwards (spec_buf_update) —
        # token-exact, but measured SLOWER than standalone prefills there
        # (964.7 vs 1205.6 tok/s int8+spec2: the fused step's decode half
        # still pays the full per-step cache materialization the
        # chunk-local decode eliminated), so it defaults off with
        # speculative_k and stays available via fused_admit=True.
        if fused_admit is None:
            # also built under adaptive sampled-spec (alt_decode): the
            # engine activates it only after committing to plain decode
            fused_admit = ("win" in params["showo"]["layers"]
                           and (not speculative_k
                                or alt_decode is not None))
        fused_for = None
        if fused_admit:
            from showo_tpu.serving.fused_admit import (build_v1_fused_admit,
                                                       spec_buf_update)

            base_for = build_v1_fused_admit(
                self, cfg, dtype=dtype, eoi=eoi, cap=cap,
                temperature=temperature, top_k=top_k, top_p=top_p)
            if speculative_k:
                upd = jax.jit(spec_buf_update)

                def fused_for(bucket, _base=base_for):
                    base = _base(bucket)

                    def wrap(ck, cv, lengths, cur, padded, true_len, slot,
                             k1, k2):
                        ck, cv, cur, toks, tok0 = base(
                            ck, cv, lengths, cur, padded, true_len, slot,
                            k1, k2)
                        self.buf = upd(self.buf, toks, lengths, padded[0],
                                       tok0, slot, true_len)
                        return ck, cv, cur, toks, tok0

                    return wrap
            else:
                fused_for = base_for

        self.engine = ContinuousBatchingEngine(
            slots=slots, cap=cap, chunk=chunk, prefill_for=make_prefill,
            decode_chunk=decode_wrapper,
            init_cache=init_cache, buckets=buckets, eot_token=eot_token,
            lookahead=lookahead,
            max_tokens_per_step=1 + speculative_k,
            fused_admit_for=fused_for,
            alt_decode_chunk=alt_decode)

    def submit(self, prompt, max_new_tokens):
        return self.engine.submit(prompt, max_new_tokens)

    def run(self, key):
        return self.engine.run(key)


class Showo2MMUServer:
    """Show-o2 (v2) MMU continuous-batching adapter.

    Requests arrive as pre-assembled input embeddings (text + time +
    image-embed rows, the layout show-o2/inference_mmu.py:120-140 builds)
    plus the image-span offset; prefill applies the v2 omni mask (image
    span bidirectional, causal elsewhere) and decode is pure-causal over
    each lane's cache (decode rows sit after every span).  GQA cache
    per-lane offsets ride the qwen2_forward ``cache_offsets`` path.
    """

    def __init__(self, cfg, params, *, slots: int = 4, cap: int = 1024,
                 chunk: int = 16, buckets: Sequence[int] = (512, 768),
                 temperature: float = 1.0, top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 eos_token: Optional[int] = None, lookahead: int = 4,
                 speculative_k: int = 0,
                 spec_chunk_local: bool = True,
                 fused_admit: Optional[bool] = None,
                 kv_int8: bool = False,
                 spec_adaptive: bool = True):
        from showo_tpu.sampling.ar import _sample_logits
        from showo_tpu.show_o2.masks import omni_attn_mask
        from showo_tpu.show_o2.qwen2 import Qwen2KVCache, qwen2_forward
        from showo_tpu.serving.decode_chunk import (kv_cache_write,
                                                    kv_cache_zeros)

        self.cfg, self.params = cfg, params
        llm = cfg.llm
        dtype = params["showo"]["embed"].dtype
        L, Hkv, Dh = llm.num_layers, llm.num_kv_heads, llm.head_dim
        n_img = cfg.num_image_tokens      # image span rows incl. time slot

        # int8 KV cache — see the ShowoMMUServer comment
        if kv_int8:
            if fused_admit:
                raise ValueError("kv_int8 requires fused_admit=False")
            fused_admit = False
            if speculative_k and not spec_chunk_local:
                raise ValueError("kv_int8 requires spec_chunk_local=True")

        def init_cache():
            shape = (L, slots, cap, Hkv, Dh)
            return (kv_cache_zeros(shape, kv_int8, dtype),
                    kv_cache_zeros(shape, kv_int8, dtype))

        # params as jit argument, not closure capture (see ShowoMMUServer)
        def make_prefill(bucket: int):
            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def prefill(params, cache_k, cache_v, padded_emb, true_len, slot,
                        key, img_start):
                tmp = Qwen2KVCache.zeros(llm, 1, bucket, dtype=dtype)
                mp = jnp.stack([img_start,
                                jnp.full_like(img_start, n_img)])[None, None]
                bias = omni_attn_mask(mp, bucket, dtype=dtype)
                cols = jnp.arange(bucket)[None, None, None, :]
                bias = jnp.where(cols < true_len, bias, NEG_INF)
                logits, _, tc = qwen2_forward(
                    llm, params["showo"], input_embeds=padded_emb,
                    attention_bias=bias, cache=tmp)
                cache_k = kv_cache_write(cache_k, tc.k, (0, slot, 0, 0))
                cache_v = kv_cache_write(cache_v, tc.v, (0, slot, 0, 0))
                last = jax.lax.dynamic_index_in_dim(
                    logits[0], true_len - 1, axis=0, keepdims=False)
                tok0 = _sample_logits(key, last[None], temperature, top_k,
                                      None, top_p)[0]
                return cache_k, cache_v, tok0

            return lambda *a: prefill(self.params, *a)

        # chunk-local fresh-KV decode (decode_chunk.py): the GQA cache
        # stays loop-invariant across the chunk's steps instead of being
        # rematerialized per iteration (the v1 finding applied to v2)
        from showo_tpu.serving.decode_chunk import build_v2_decode_chunk

        decode_wrapper = build_v2_decode_chunk(
            self, llm, slots=slots, cap=cap, chunk=chunk, dtype=dtype,
            temperature=temperature, top_k=top_k, top_p=top_p)
        self._spec = speculative_k
        self._cap = cap
        alt_decode = None
        if speculative_k:
            # greedy (top_k=1) verify is token-exact; sampling configs use
            # rejection resampling (distribution-exact) — see speculative.py
            from showo_tpu.serving.speculative import build_v2_speculative

            # A/B the plain program under temperature sampling (see the
            # v1 comment): the engine commits to the measured winner
            greedy = top_k == 1 and (top_p is None or top_p >= 1.0)
            if spec_adaptive and not greedy:
                alt_decode = decode_wrapper
            self.buf = jnp.zeros((slots, cap), jnp.int32)
            make_prefill, decode_wrapper = build_v2_speculative(
                self, cfg, dtype=dtype, n_img=n_img, cap=cap, chunk=chunk,
                draft_k=speculative_k, temperature=temperature,
                top_k=top_k, top_p=top_p, chunk_local=spec_chunk_local)

        if fused_admit is None:
            # see the v1 comment: under adaptive sampled-spec the engine
            # activates fused admission after committing to plain decode
            fused_admit = not speculative_k or alt_decode is not None
        fused_for = None
        if fused_admit:
            from showo_tpu.serving.fused_admit import (build_v2_fused_admit,
                                                       spec_buf_update)

            base_for = build_v2_fused_admit(
                self, cfg, dtype=dtype, n_img=n_img, cap=cap,
                temperature=temperature, top_k=top_k, top_p=top_p)
            if speculative_k:
                # admission rides a plain fused step; the draft ring
                # records it (see the v1 comment above)
                upd = jax.jit(spec_buf_update)

                def fused_for(bucket, _base=base_for):
                    base = _base(bucket)

                    def wrap(ck, cv, lengths, cur, padded, true_len, slot,
                             k1, k2, img_start, lookup_row):
                        ck, cv, cur, toks, tok0 = base(
                            ck, cv, lengths, cur, padded, true_len, slot,
                            k1, k2, img_start)
                        self.buf = upd(self.buf, toks, lengths, lookup_row,
                                       tok0, slot, true_len)
                        return ck, cv, cur, toks, tok0

                    return wrap
            else:
                fused_for = base_for

        self.engine = ContinuousBatchingEngine(
            slots=slots, cap=cap, chunk=chunk, prefill_for=make_prefill,
            decode_chunk=decode_wrapper,
            init_cache=init_cache, buckets=buckets, eot_token=eos_token,
            lookahead=lookahead,
            max_tokens_per_step=1 + speculative_k,
            fused_admit_for=fused_for,
            alt_decode_chunk=alt_decode)

    def submit(self, input_embeds, img_start: int, max_new_tokens: int,
               lookup_ids=None):
        """input_embeds: [S, D] assembled prompt rows; img_start: offset of
        the image span (incl. the time-embed slot) within those rows.
        lookup_ids (speculative mode): token ids of the TRAILING text rows
        (e.g. the question) — they seed the n-gram draft corpus at their
        true sequence positions."""
        emb = np.asarray(input_embeds)
        meta = [jnp.asarray(img_start, jnp.int32)]
        if self._spec:
            row = np.full(self._cap, -1, np.int32)
            if lookup_ids is not None and len(lookup_ids):
                ids = np.asarray(lookup_ids, np.int32)
                row[emb.shape[0] - len(ids):emb.shape[0]] = ids
            meta.append(jnp.asarray(row))
        return self.engine.submit(emb, max_new_tokens, meta=tuple(meta))

    def run(self, key):
        return self.engine.run(key)
