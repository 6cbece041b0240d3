"""bucket_route: the ragged-all-to-all primitive for sub-transient
distributed binning (parallel/route.py).  8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_splatterer_tpu.parallel.route import (
    bucket_local,
    bucket_route,
    route_back,
    unbucket_local,
)

S = 8  # shards
L = 96  # local records per shard
K = 4  # payload rows


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()[:S]
    if len(devs) < S:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs), ("shard",))


def make_records(seed, skew=None):
    """Per-shard (dst, payload): payload row 0 encodes (src, local index)
    so receivers can verify provenance and order."""
    rng = np.random.default_rng(seed)
    dst = rng.integers(0, S, size=(S, L)).astype(np.int32)
    if skew is not None:
        dst[:, : L // 2] = skew  # half of every shard's records to one dst
    payload = rng.normal(size=(S, K, L)).astype(np.float32)
    payload[:, 0] = (
        np.arange(S, dtype=np.float32)[:, None] * 1000
        + np.arange(L, dtype=np.float32)[None, :]
    )
    return dst, payload


def run_route(mesh, dst, payload, cap):
    shard_map = jax.shard_map

    @jax.jit
    def go(dst, payload):
        def body(d, p):
            recv, valid, mc = bucket_route(d[0], p[0], cap, "shard")
            return recv, valid, mc[None]

        f = shard_map(
            body,
            mesh=mesh,
            in_specs=(P("shard"), P("shard")),
            out_specs=(P("shard"), P("shard"), P("shard")),
        )
        recv, valid, mc = f(dst, payload)
        return recv, valid, mc

    # shard_map adds a leading local axis of size 1 per shard input
    recv, valid, mc = go(
        jax.device_put(dst, NamedSharding(mesh, P("shard"))),
        jax.device_put(payload, NamedSharding(mesh, P("shard", None))),
    )
    return np.asarray(recv), np.asarray(valid), np.asarray(mc)


def test_every_record_routes_exactly_once(mesh):
    dst, payload = make_records(0)
    cap = L  # generous: no overflow possible
    recv, valid, mc = run_route(mesh, dst, payload, cap)
    # recv: (S_dst * S_src, K, cap) flattened dst-major by shard_map
    recv = recv.reshape(S, S, K, cap)
    valid = valid.reshape(S, S, cap)
    assert (mc <= cap).all()
    got = sorted(recv[d, s, 0, i] for d in range(S) for s in range(S)
                 for i in range(cap) if valid[d, s, i])
    want = sorted(
        payload[s, 0, j] for s in range(S) for j in range(L)
        if 0 <= dst[s, j] < S
    )
    np.testing.assert_array_equal(got, want)
    # provenance: block (d, s) holds only records from shard s routed to d
    for d in range(S):
        for s in range(S):
            ids = recv[d, s, 0][valid[d, s]]
            assert all(int(x) // 1000 == s for x in ids)
            js = [int(x) % 1000 for x in ids]
            assert js == sorted(js), "sender order must be preserved"
            assert all(dst[s, j] == d for j in js)
    # full payload rows ride along intact
    d0, s0 = int(dst[0, 0]), 0
    i = list(recv[d0, s0, 0][valid[d0, s0]]).index(payload[0, 0, 0])
    np.testing.assert_array_equal(recv[d0, s0, :, i], payload[0, :, 0])


def test_overflow_detected_not_silent_corruption(mesh):
    dst, payload = make_records(1, skew=3)  # half of all records -> shard 3
    cap = L // 8  # far too small for the skewed destination
    recv, valid, mc = run_route(mesh, dst, payload, cap)
    assert (mc > cap).any(), "overflow must be reported"
    recv = recv.reshape(S, S, K, cap)
    valid = valid.reshape(S, S, cap)
    # everything that DID arrive is genuine (no garbage slots)
    for d in range(S):
        for s in range(S):
            for x in recv[d, s, 0][valid[d, s]]:
                j = int(x) % 1000
                assert int(x) // 1000 == s and dst[s, j] == d


def test_bucket_local_drops_out_of_range():
    dst = jnp.asarray([0, 1, -1, 5, 1, 2], jnp.int32)
    payload = jnp.arange(6, dtype=jnp.float32)[None, :]
    buckets, valid, mc = bucket_local(dst, payload, n_dst=3, cap=4)
    assert int(mc) == 2  # dst 1 holds two records
    vals = sorted(float(buckets[d, 0, i]) for d in range(3) for i in range(4)
                  if bool(valid[d, i]))
    assert vals == [0.0, 1.0, 4.0, 5.0]  # -1 and 5 dropped


@pytest.mark.parametrize("cap", [4, 2])
def test_unbucket_inverts_bucket_local(cap):
    """unbucket_local(bucket_local(x)) == x for kept records, 0 for
    dropped (out-of-range destination or bucket overflow)."""
    rng = np.random.default_rng(7)
    n_dst, l, k = 5, 37, 3
    dst = jnp.asarray(rng.integers(-1, n_dst + 1, l), jnp.int32)
    payload = jnp.asarray(rng.normal(size=(k, l)).astype(np.float32))
    buckets, valid, mc = bucket_local(dst, payload, n_dst, cap)
    from gaussian_splatterer_tpu.parallel.route import unbucket_local

    back = unbucket_local(dst, buckets, cap)
    # recompute which records were kept: in-range dst, rank within cap
    dstn = np.asarray(dst)
    kept = np.zeros(l, bool)
    counts = {d: 0 for d in range(n_dst)}
    for j in range(l):
        d = int(dstn[j])
        if 0 <= d < n_dst:
            if counts[d] < cap:
                kept[j] = True
            counts[d] += 1
    want = np.where(kept[None, :], np.asarray(payload), 0.0)
    np.testing.assert_array_equal(np.asarray(back), want)


def test_route_back_returns_to_sender(mesh):
    """The gradient return route: receiver transforms every received
    record; the sender gets the transformed value back at the record's
    original position (zeros where the record was dropped)."""
    dst, payload = make_records(3)
    cap = L  # no overflow
    shard_map = jax.shard_map

    @jax.jit
    def go(dst, payload):
        def body(d, p):
            d, p = d[0], p[0]
            recv, valid, _ = bucket_route(d, p, cap, "shard")
            # receiver-side "gradient": 2x the payload, masked by valid
            grads = jnp.where(valid[:, None, :], recv * 2.0, 0.0)
            back = route_back(d, grads, cap, "shard")
            return back[None]

        f = shard_map(
            body, mesh=mesh,
            in_specs=(P("shard"), P("shard")),
            out_specs=P("shard"),
        )
        return f(dst, payload)

    back = np.asarray(go(
        jax.device_put(dst, NamedSharding(mesh, P("shard"))),
        jax.device_put(payload, NamedSharding(mesh, P("shard", None))),
    )).reshape(S, K, L)
    kept = (dst >= 0) & (dst < S)
    want = np.where(kept[:, None, :], payload * 2.0, 0.0)
    np.testing.assert_allclose(back, want, rtol=1e-6)
