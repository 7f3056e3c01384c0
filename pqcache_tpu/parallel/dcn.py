"""Multi-host serving: DCN-aware meshes + host-local data feeding.

BASELINE.md's scaling north star is many concurrent long-context streams
over multiple hosts. The reference has no distributed story at all (its
engine is single-GPU, batch-1, with CPU offload over PCIe); on TPU pods
the natural layout is

    dp (slot pool)  →  OUTER axis, spans hosts over DCN
    tp (heads)      →  INNER axis, stays inside a host's ICI domain

so the per-token Megatron psums of the tp engine ride ICI only, and the
dp axis needs NO collectives during decode at all (each dp group owns its
slots end-to-end) — DCN carries nothing but the initial parameter
broadcast and the per-chunk host-side token exchange.

This module provides the multihost-safe plumbing around
parallel/batch_tp.BatchTPEngine:

  * `init_distributed()` — jax.distributed bootstrap (no-op single-host).
  * `serving_mesh(dp, tp)` — hybrid DCN×ICI device mesh
    (mesh_utils.create_hybrid_device_mesh) when multiple processes are
    present, plain ICI mesh otherwise. Axis names ("dp", "tp") match the
    engines' specs.
  * `host_local_rows()` / `read_local_rows()` — build a dp-sharded global
    array from per-process rows and read back only the addressable ones:
    no host ever materializes another host's prompts or tokens.
  * `DistributedBatchTPEngine.generate_batch_local()` — the multi-host
    serving loop: every process feeds its OWN prompts, decode-chunk
    termination is agreed via a process allgather of done flags.

All paths execute identically under a single process (where local ==
global) — which is how tests/test_dcn.py validates them on the 8-device
CPU mesh; on a real multi-host pod the same code runs unchanged after
init_distributed().
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pqcache_tpu.parallel.batch_tp import BatchTPEngine


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Bootstrap jax.distributed for a multi-host run. With no arguments,
    relies on the cluster environment (TPU pod metadata / SLURM); a no-op
    when already initialized or when running single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        # single host, nothing to coordinate
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def serving_mesh(dp: int, tp: int, *, devices=None) -> Mesh:
    """(dp, tp) mesh with dp spanning hosts over DCN when multi-process.

    Multi-process: dp must be a multiple of the process count; each
    process contributes dp/n_proc × tp of its local devices, and
    create_hybrid_device_mesh orders the DCN axis outermost so dp indices
    are process-contiguous (host h owns dp groups
    [h·dp/n_proc, (h+1)·dp/n_proc)).
    """
    n_proc = jax.process_count()
    if n_proc > 1:
        if dp % n_proc:
            raise ValueError(f"dp={dp} must be a multiple of process "
                             f"count {n_proc}")
        try:
            devs = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(dp // n_proc, tp),
                dcn_mesh_shape=(n_proc, 1),
                devices=devices)
        except ValueError:
            # non-TPU multi-process (e.g. the 2-process CPU validation,
            # tools_dcn_2proc.py): devices carry no slice_index, so group
            # by process_index directly — same invariant (host h owns dp
            # rows [h·dp/n_proc, (h+1)·dp/n_proc))
            all_devs = list(devices) if devices is not None else jax.devices()
            by_proc: dict = {}
            for d in all_devs:
                by_proc.setdefault(d.process_index, []).append(d)
            rows = [np.asarray(by_proc[p], object).reshape(
                        dp // n_proc, tp) for p in sorted(by_proc)]
            devs = np.concatenate(rows, axis=0)
    else:
        devs = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    return Mesh(devs, axis_names=("dp", "tp"))


def _proc_rows(mesh: Mesh, n_rows: int) -> tuple[int, int]:
    """This process's contiguous [start, stop) range of a dp-sharded
    leading axis of length n_rows."""
    n_proc = jax.process_count()
    assert n_rows % n_proc == 0, (n_rows, n_proc)
    per = n_rows // n_proc
    pid = jax.process_index()
    return pid * per, (pid + 1) * per


def host_local_rows(mesh: Mesh, spec: P, global_shape: tuple,
                    local_rows: np.ndarray, dtype=None) -> jax.Array:
    """Global dp-sharded array assembled from per-process rows.

    `local_rows` holds ONLY this process's slice of the leading axis
    (shape [n_global/n_proc, ...]); jax.make_array_from_callback invokes
    the callback for addressable shards alone, so no host touches remote
    rows. Single-process this is equivalent to jnp.asarray(local_rows)
    with the given sharding.
    """
    local_rows = np.asarray(local_rows, dtype)
    start, stop = _proc_rows(mesh, global_shape[0])
    assert local_rows.shape[0] == stop - start, (local_rows.shape,
                                                 global_shape)
    sharding = NamedSharding(mesh, spec)

    def cb(index):
        r = index[0]
        lo = 0 if r.start is None else r.start
        hi = global_shape[0] if r.stop is None else r.stop
        assert start <= lo and hi <= stop, (
            "callback asked for non-addressable rows", index)
        return local_rows[(slice(lo - start, hi - start),) + tuple(index[1:])]

    return jax.make_array_from_callback(global_shape, sharding, cb)


def read_local_rows(arr: jax.Array, n_rows: int) -> tuple[np.ndarray, int]:
    """Addressable rows of a dp-sharded array as one ndarray, plus this
    process's global row offset. Rows within the local range arrive in
    global order."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    seen = {}
    for s in shards:
        lo = s.index[0].start or 0
        if lo not in seen:
            seen[lo] = np.asarray(s.data)
    rows = [seen[k] for k in sorted(seen)]
    out = np.concatenate(rows, axis=0)
    start = min(seen) if seen else 0
    return out, start


def all_hosts_done(local_done: bool) -> bool:
    """Termination agreement across processes (single-process: identity)."""
    if jax.process_count() == 1:
        return local_done
    from jax.experimental import multihost_utils
    flags = multihost_utils.process_allgather(
        jnp.asarray([1 if local_done else 0], jnp.int32))
    return bool(np.all(np.asarray(flags)))


def global_params(mesh: Mesh, params: dict) -> dict:
    """Lift a per-host (replicated-value) param pytree into global arrays
    for multi-process jit. Params carry no dp axis — every host holds the
    same values — so the host-local array IS the global logical value;
    single-process this is the identity."""
    if jax.process_count() == 1:
        return params
    from jax.experimental import multihost_utils
    from pqcache_tpu.parallel.tp_decode import PARAM_SPECS
    return multihost_utils.host_local_array_to_global_array(
        params, mesh, PARAM_SPECS)


class DistributedBatchTPEngine(BatchTPEngine):
    """BatchTPEngine with multihost-safe feeding: every process supplies
    only ITS slots' prompts and reads back only its slots' tokens."""

    def __init__(self, cfg, params, mesh, prefill_len, max_new_tokens,
                 dtype=jnp.bfloat16, interleave: str = "auto"):
        super().__init__(cfg, global_params(mesh, params), mesh,
                         prefill_len, max_new_tokens, dtype,
                         interleave=interleave)

    def init_state(self, B: int):
        """Zero state created collectively ON-DEVICE with the engine's
        shardings (a host-local zeros pytree is not a valid global-array
        input under multi-process jit)."""
        if jax.process_count() == 1:
            return super().init_state(B)
        from pqcache_tpu.parallel.batch_tp import batch_state_specs
        specs = batch_state_specs(jhist=self.policy.use_jhist,
                                  ring=bool(self.policy.ring_k),
                                  int8_scales=self.policy.kv_int8)
        shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(self.mesh, s), specs)
        shapes = jax.eval_shape(lambda: BatchTPEngine.init_state(self, B))
        return jax.jit(
            lambda: jax.tree_util.tree_map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes),
            out_shardings=shardings)()

    def serve_local(self, requests: Sequence, max_new_tokens: int,
                    eos_ids=(), slots_per_group: int = 1) -> dict:
        """Continuous batching across hosts: this process's request queue
        (seq_id, prompt_ids) feeds its dp groups' slot pool; finished slots
        retire and new requests are admitted at chunk boundaries
        (iteration-level scheduling, the multi-host form of
        runtime/batch_engine.BatchEngine.run).

        All device programs are collective: an admission wave runs when ANY
        host has an admission for that local slot index (groups with
        nothing to admit join the wave with admit=0 and their state is
        untouched — the predicated insert in batch_tp), and decode chunks
        advance every slot everywhere. Agreement uses only host-side
        process allgathers. With `self.interleave` (chunked prefill), the
        wave is SLAB-WISE: one chunk-major slab program advances between
        decode chunks, so running streams on every host stall at most one
        slab per admission instead of a full prefill (the multi-host form
        of BatchEngine's interleaved admission); token streams are
        identical either way. Returns {seq_id: tokens} for THIS process's
        requests."""
        n_proc = jax.process_count()
        dp_local = self.dp // n_proc
        B_loc = slots_per_group
        B = B_loc * self.dp
        mesh = self.mesh
        queue = list(requests)
        results: dict = {}
        bstate = self.init_state(B)

        # slot bookkeeping: [dp_local][B_loc] — device slot order for this
        # process's rows is (local group g, local slot w)
        slots = [[{"done": True, "sid": None, "toks": None, "pos": 0}
                  for _ in range(B_loc)] for _ in range(dp_local)]

        def build_admission(w):
            """Collect this host's admissions for local slot index w.
            Returns None when NO host admits at w (collective check)."""
            admit = np.zeros((dp_local,), np.int32)
            toks = np.zeros((dp_local, self.P), np.int32)
            pads = np.zeros((dp_local,), np.int32)
            tlens = np.full((dp_local,), self.P, np.int32)  # dummy-valid
            pend = {}
            for g in range(dp_local):
                if slots[g][w]["done"] and queue:
                    sid, ids = queue.pop(0)
                    ids = np.asarray(ids, np.int32)
                    admit[g] = 1
                    pads[g] = self.P - len(ids)
                    tlens[g] = len(ids)
                    toks[g, pads[g]:] = ids
                    pend[g] = (sid, len(ids))
            # collective skip: no admissions anywhere at this slot index
            if all_hosts_done(admit.sum() == 0):
                return None
            return {"w": w, "admit": admit, "toks": toks, "pads": pads,
                    "tlens": tlens, "pend": pend}

        def record_firsts(adm, first):
            f, _ = read_local_rows(first, self.dp)
            w = adm["w"]
            for g, (sid, tlen) in adm["pend"].items():
                slots[g][w] = {"done": int(f[g]) in eos_ids, "sid": sid,
                               "toks": [int(f[g])], "pos": tlen}
                if slots[g][w]["done"]:
                    results[sid] = slots[g][w]["toks"]

        def admit_wave(adm, bstate):
            """Monolithic collective prefill wave."""
            first, bstate = self._prefill(
                self.params, bstate,
                host_local_rows(mesh, P("dp", None), (self.dp, self.P),
                                adm["toks"], np.int32),
                host_local_rows(mesh, P("dp"), (self.dp,), adm["pads"],
                                np.int32),
                host_local_rows(mesh, P("dp"), (self.dp,), adm["tlens"],
                                np.int32),
                jnp.asarray(adm["w"], jnp.int32),
                host_local_rows(mesh, P("dp"), (self.dp,), adm["admit"],
                                np.int32))
            record_firsts(adm, first)
            return bstate

        def decode_once(bstate):
            cur = np.zeros((B_loc * dp_local,), np.int32)
            poss = np.zeros((B_loc * dp_local,), np.int32)
            for g in range(dp_local):
                for w in range(B_loc):
                    s = slots[g][w]
                    i = g * B_loc + w
                    cur[i] = s["toks"][-1] if s["toks"] else 0
                    poss[i] = s["pos"]
            toks, bstate = self._decode(
                self.params, bstate,
                host_local_rows(mesh, P("dp"), (B,), cur, np.int32),
                host_local_rows(mesh, P("dp"), (B,), poss, np.int32))
            t_np, _ = read_local_rows(toks, B)      # [B_local, chunk]
            for g in range(dp_local):
                for w in range(B_loc):
                    s = slots[g][w]
                    s["pos"] += self.chunk
                    if s["done"]:
                        continue
                    for t in t_np[g * B_loc + w]:
                        s["toks"].append(int(t))
                        if (int(t) in eos_ids
                                or len(s["toks"]) >= max_new_tokens):
                            s["done"] = True
                            results[s["sid"]] = s["toks"][:max_new_tokens]
                            break
            return bstate

        if not self.interleave:
            while True:
                for w in range(B_loc):
                    adm = build_admission(w)
                    if adm is not None:
                        bstate = admit_wave(adm, bstate)
                idle = all(s["done"] for row in slots for s in row)
                if all_hosts_done(idle and not queue):
                    break
                bstate = decode_once(bstate)
            return results

        # interleaved: at most one pending SLAB-WISE wave; one slab program
        # advances per decode chunk. pending-ness is a collective decision
        # (build_admission's allgather), so every host runs the same slab
        # and tail programs in lockstep.
        from jax.sharding import NamedSharding
        m_g = self.cfg_local.model
        kv_shape = (self.dp, m_g.num_layers, m_g.num_kv_heads * self.tp,
                    self.P, m_g.head_dim)
        # cache the jitted zeros constructor on the engine (keyed by shape):
        # a fresh jax.jit wrapper per serve_local call would re-trace and
        # re-compile the admission-buffer program on every invocation
        if getattr(self, "_kv_zeros_shape", None) != kv_shape:
            self._kv_zeros_shape = kv_shape
            self._kv_zeros = jax.jit(
                lambda: jnp.zeros(kv_shape, self.dtype),
                out_shardings=NamedSharding(mesh, self._kvspec))
        kv_zeros = self._kv_zeros
        ch = self._pf_chunk
        n_slabs = self.P // ch
        pending = None
        wave_w = 0
        while True:
            if pending is None:
                adm = build_admission(wave_w)
                if adm is not None:
                    adm["kbuf"], adm["vbuf"] = kv_zeros(), kv_zeros()
                    adm["h"] = None
                    adm["i"] = 0
                    adm["pads_g"] = host_local_rows(
                        mesh, P("dp"), (self.dp,), adm["pads"], np.int32)
                    pending = adm
                wave_w = (wave_w + 1) % B_loc
            idle = all(s["done"] for row in slots for s in row)
            if pending is None and all_hosts_done(idle and not queue):
                break
            if not all_hosts_done(idle):
                bstate = decode_once(bstate)
            if pending is not None:
                c0 = pending["i"] * ch
                toks_c = host_local_rows(
                    mesh, P("dp", None), (self.dp, ch),
                    np.ascontiguousarray(pending["toks"][:, c0:c0 + ch]),
                    np.int32)
                pending["kbuf"], pending["vbuf"], pending["h"] = \
                    self._slab_fn(c0)(self.params, pending["kbuf"],
                                      pending["vbuf"], toks_c,
                                      pending["pads_g"])
                pending["i"] += 1
                if pending["i"] == n_slabs:
                    first, bstate = self._admit_tail(
                        self.params, bstate, pending["kbuf"],
                        pending["vbuf"], pending["h"], pending["pads_g"],
                        host_local_rows(mesh, P("dp"), (self.dp,),
                                        pending["tlens"], np.int32),
                        jnp.asarray(pending["w"], jnp.int32),
                        host_local_rows(mesh, P("dp"), (self.dp,),
                                        pending["admit"], np.int32))
                    record_firsts(pending, first)
                    pending = None
        return results

    def generate_batch_local(self, local_prompts: Sequence,
                             max_new_tokens: int, eos_ids=()) -> list:
        """Run B_local = len(local_prompts) slots on this process's dp
        groups (global B = B_local × process_count). Returns this
        process's token lists. Every process must call this collectively
        with the same B_local and max_new_tokens."""
        n_proc = jax.process_count()
        dp_local = self.dp // n_proc
        B_local = len(local_prompts)
        if B_local % dp_local:
            raise ValueError(f"B_local={B_local} must be a multiple of "
                             f"local dp groups {dp_local}")
        if max_new_tokens > self.max_new:
            raise ValueError("max_new_tokens exceeds engine reservation")
        B = B_local * n_proc
        B_loc = B // self.dp               # slots per dp group
        bstate = self.init_state(B)
        mesh = self.mesh

        firsts = np.zeros((B_local,), np.int32)
        for w in range(B_loc):
            toks = np.zeros((dp_local, self.P), np.int32)
            pads = np.zeros((dp_local,), np.int32)
            tlens = np.zeros((dp_local,), np.int32)
            for g in range(dp_local):
                ids = np.asarray(local_prompts[g * B_loc + w], np.int32)
                pads[g] = self.P - len(ids)
                tlens[g] = len(ids)
                toks[g, pads[g]:] = ids
            first, bstate = self._prefill(
                self.params, bstate,
                host_local_rows(mesh, P("dp", None), (self.dp, self.P),
                                toks, np.int32),
                host_local_rows(mesh, P("dp"), (self.dp,), pads, np.int32),
                host_local_rows(mesh, P("dp"), (self.dp,), tlens, np.int32),
                jnp.asarray(w, jnp.int32),
                host_local_rows(mesh, P("dp"), (self.dp,),
                                np.ones((dp_local,), np.int32), np.int32))
            f, _ = read_local_rows(first, self.dp)
            for g in range(dp_local):
                firsts[g * B_loc + w] = f[g]

        outs = [[int(firsts[i])] for i in range(B_local)]
        poss = np.asarray([len(np.asarray(p)) for p in local_prompts],
                          np.int32)
        done = [outs[i][0] in eos_ids for i in range(B_local)]
        while not all_hosts_done(
                all(len(o) >= max_new_tokens or d
                    for o, d in zip(outs, done))):
            cur = np.asarray([o[-1] for o in outs], np.int32)
            toks, bstate = self._decode(
                self.params, bstate,
                host_local_rows(mesh, P("dp"), (B,), cur, np.int32),
                host_local_rows(mesh, P("dp"), (B,), poss, np.int32))
            t_np, _ = read_local_rows(toks, B)     # [B_local, chunk]
            poss = poss + self.chunk
            for i in range(B_local):
                if done[i]:
                    continue
                for t in t_np[i]:
                    outs[i].append(int(t))
                    if int(t) in eos_ids or len(outs[i]) >= max_new_tokens:
                        done[i] = True
                        break
        return [o[:max_new_tokens] for o in outs]
