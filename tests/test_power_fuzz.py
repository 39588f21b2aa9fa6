"""Seeded random-topology parity sweep for operators/power.py: random
power networks (chains, stars, isolated segments, mixed non-power ways,
unparseable tags) vs an independent scalar transcription of
PowerModule.java:66-99,399-490 with the documented MAX tower
aggregation."""

import math
import random

import pytest

N_SEGS = 400


def _rng():
    return random.Random(0x70AEB)


def _mk_network(r):
    segs = []
    nodes = {}
    sid = 0
    node_seq = 0
    for _ in range(60):
        shape = r.choice(["chain", "star", "pair", "isolated"])
        n = r.randint(2, 6)
        ids = [node_seq + j for j in range(n)]
        node_seq += n
        for nid in ids:
            nodes[nid] = (
                {"height": str(r.randint(5, 60))} if r.random() < 0.3 else {}
            )
        if shape == "chain":
            pairs = list(zip(ids, ids[1:]))
        elif shape == "star":
            pairs = [(ids[0], o) for o in ids[1:]]
        elif shape == "pair":
            pairs = [(ids[0], ids[1])]
        else:
            pairs = [(ids[j], ids[j + 1]) for j in range(0, n - 1, 2)]
        for a, b in pairs:
            tags = {}
            tags["power"] = r.choice(["line", "line", "line", "minor_line"])
            if r.random() < 0.8:
                tags["cables"] = r.choice(
                    ["1", "2", "3", "4", "5", "6", "8", "10", "12", "0", "-2",
                     "many", "3.5"]
                )
            if r.random() < 0.6:
                tags["voltage"] = r.choice(
                    ["10000", "20000", "50000", "110000", "220000", "380000",
                     "high", "0"]
                )
            segs.append((f"s{sid}", a, b, tags))
            sid += 1
            if len(segs) >= N_SEGS:
                return segs, nodes
    return segs, nodes


# ------------------------------------------------------------ oracle


def _jint(v):
    if v is None:
        return None
    try:
        return int(v)
    except ValueError:
        return None


def _height(tags, default):
    v = tags.get("height")
    if v is not None:
        try:
            h = float(int(v))
            if h > 0:
                return h
        except ValueError:
            pass
    return default


def oracle(segs, nodes):
    # tower config: MAX over connected power=line segs (documented
    # deviation from Java's iteration-order last-wins)
    per_node = {}
    for _, a, b, tags in segs:
        if tags.get("power") != "line":
            continue
        c, v = _jint(tags.get("cables")), _jint(tags.get("voltage"))
        for nid in (a, b):
            cc, vv = per_node.get(nid, (-1, -1))
            if c is not None:
                cc = max(cc, c)
            if v is not None:
                vv = max(vv, v)
            per_node[nid] = (cc, vv)

    def is_high(nid):
        cc, vv = per_node.get(nid, (-1, -1))
        return vv >= 50000 or cc >= 6

    out = {}
    for sid, a, b, tags in segs:
        if tags.get("power") != "line":
            continue
        cables = _jint(tags.get("cables"))
        if cables is None or cables <= 0:
            continue
        voltage = _jint(tags.get("voltage"))
        volt = -1 if voltage is None else voltage
        high = is_high(a) or is_high(b)
        runs = []
        if not high:
            hs = _height(nodes[a], 14.0) + 0.25
            he = _height(nodes[b], 14.0) + 0.25
            bs, be = hs - 0.5, he - 0.5
            runs += [(2.0, bs + 0.5, be + 0.5), (-2.0, bs + 0.5, be + 0.5)]
            if cables >= 3:
                runs.append((0.0, bs + 0.5, be + 0.5))
            if cables >= 5:
                runs += [(1.5, bs - 0.5, be - 0.5), (-1.5, bs - 0.5, be - 0.5)]
        else:
            dh = 40.0 if volt > 150000 else 30.0
            pw = 16.0 if volt > 150000 else 13.0
            hs, he = _height(nodes[a], dh), _height(nodes[b], dh)
            hqs = 2.5 * (int(hs / 2.5) // 5)
            hqe = 2.5 * (int(he / 2.5) // 5)
            runs.append((0.0, -0.5 + 5.0 * hqs, -0.5 + 5.0 * hqe))
            cys, cye = -0.7 + hs / 2, -0.7 + he / 2
            runs += [(0.9 * pw, cys, cye), (-0.9 * pw, cys, cye)]
            if 3 < cables <= 9:
                runs += [(0.45 * pw, cys, cye), (-0.45 * pw, cys, cye)]
            elif cables > 9:
                runs += [(0.6 * pw, cys, cye), (-0.6 * pw, cys, cye),
                         (0.3 * pw, cys, cye), (-0.3 * pw, cys, cye)]
            if cables >= 7:
                uys = -0.7 + 4.0 * hqs
                uye = -0.7 + 4.0 * hqe
                runs += [(0.9 * 0.6 * pw, uys, uye), (-0.9 * 0.6 * pw, uys, uye)]
                if cables >= 9:
                    runs += [(0.45 * 0.6 * pw, uys, uye),
                             (-0.45 * 0.6 * pw, uys, uye)]
        out[sid] = (int(high), runs)
    return out


def test_power_random_topology(spark):
    from osm2world_spark.operators.power import power_cable_runs

    r = _rng()
    segs, nodes = _mk_network(r)
    seg_df = spark.createDataFrame(
        segs, "seg_id string, start_node long, end_node long, tags map<string,string>"
    )
    node_df = spark.createDataFrame(
        [(nid, t) for nid, t in nodes.items()],
        "node_id long, tags map<string,string>",
    )
    got = {}
    for row in power_cable_runs(seg_df, node_df).collect():
        got.setdefault(row["seg_id"], []).append(row)
    for v in got.values():
        v.sort(key=lambda x: x["run_idx"])

    exp = oracle(segs, nodes)
    assert set(got) == set(exp)
    for sid, (high, runs) in exp.items():
        rows = got[sid]
        assert rows[0]["is_high_i"] == high, (sid, rows[0])
        assert rows[0]["n_runs"] == len(runs) == len(rows), (sid, len(rows))
        for i, (right, ys, ye) in enumerate(runs):
            assert rows[i]["right"] == pytest.approx(right, abs=0), (sid, i)
            assert rows[i]["y_start"] == pytest.approx(ys, abs=0), (sid, i)
            assert rows[i]["y_end"] == pytest.approx(ye, abs=0), (sid, i)
    # the sweep actually exercised both branches and skips
    assert sum(1 for h, _ in exp.values() if h) > 5
    assert sum(1 for h, _ in exp.values() if not h) > 5
    assert len(exp) < sum(1 for s in segs if s[3].get("power") == "line")
