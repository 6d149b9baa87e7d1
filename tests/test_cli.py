"""CLI integration tests (in-process, mirrors reference test/test_cli.py)."""
import numpy as np
import pytest

from pecanpy_tpu import cli
from pecanpy_tpu.graph import DenseGraph, SparseGraph


def run_cli(*argv):
    cli.main(list(argv))


def test_tocsr_task(tmp_path, karate_edg):
    out = str(tmp_path / "karate.csr.npz")
    run_cli("--input", karate_edg, "--output", out, "--task", "tocsr")
    g = SparseGraph()
    g.read_npz(out, weighted=False)
    assert g.num_nodes == 34


def test_todense_task(tmp_path, karate_edg):
    out = str(tmp_path / "karate.dense.npz")
    run_cli("--input", karate_edg, "--output", out, "--task", "todense")
    g = DenseGraph()
    g.read_npz(out, weighted=False)
    assert g.data.shape == (34, 34)


@pytest.mark.parametrize("mode", ["SparseOTF", "FirstOrderUnweighted"])
def test_end_to_end_text_output(tmp_path, karate_edg, mode):
    out = str(tmp_path / "karate.emb")
    run_cli(
        "--input", karate_edg, "--output", out, "--mode", mode,
        "--dimensions", "8", "--walk-length", "5", "--num-walks", "2",
        "--window-size", "3", "--random_state", "0",
    )
    with open(out) as f:
        header = f.readline().split()
        assert header == ["34", "8"]
        rows = f.readlines()
    assert len(rows) == 34
    assert all(len(r.split()) == 9 for r in rows)


def test_end_to_end_npz_output(tmp_path, karate_edg):
    out = str(tmp_path / "karate.emb.npz")
    run_cli(
        "--input", karate_edg, "--output", out,
        "--dimensions", "8", "--walk-length", "5", "--num-walks", "2",
        "--window-size", "3", "--random_state", "0",
    )
    raw = np.load(out)
    assert raw["data"].shape == (34, 8)
    assert len(raw["IDs"]) == 34


def test_npz_input_pipeline(tmp_path, karate_edg):
    csr = str(tmp_path / "karate.csr.npz")
    run_cli("--input", karate_edg, "--output", csr, "--task", "tocsr")
    out = str(tmp_path / "karate.emb.npz")
    run_cli(
        "--input", csr, "--output", out,
        "--dimensions", "8", "--walk-length", "5", "--num-walks", "2",
        "--random_state", "0",
    )
    assert np.load(out)["data"].shape == (34, 8)


def test_first_order_unweighted_rejects_params(tmp_path, karate_edg):
    out = str(tmp_path / "x.emb")
    with pytest.raises(ValueError, match="FirstOrderUnweighted only works"):
        run_cli(
            "--input", karate_edg, "--output", out,
            "--mode", "FirstOrderUnweighted", "--p", "0.5",
        )


def test_precomp_first_order_rejects_params(tmp_path, karate_edg):
    out = str(tmp_path / "x.emb")
    with pytest.raises(ValueError, match="PreCompFirstOrder only works"):
        run_cli(
            "--input", karate_edg, "--output", out,
            "--mode", "PreCompFirstOrder", "--p", "0.5", "--q", "2",
        )


def test_directed_extend_rejected_weighted_cli(tmp_path, karate_edg):
    out = str(tmp_path / "x.emb")
    with pytest.raises(NotImplementedError):
        run_cli(
            "--input", karate_edg, "--output", out,
            "--directed", "--extend", "--weighted",
        )


def test_mode_recommendation_warning(tmp_path, karate_edg):
    out = str(tmp_path / "x.emb.npz")
    with pytest.warns(UserWarning, match="FirstOrderUnweighted"):
        run_cli(
            "--input", karate_edg, "--output", out,
            "--dimensions", "4", "--walk-length", "3", "--num-walks", "1",
            "--random_state", "0",
        )


def test_directed_extend_rejected(tmp_path, karate_edg):
    """node2vec+ on directed graphs is rejected (reference cli.py:282-283)."""
    from pecanpy_tpu import cli

    args = cli.parse_args([
        "--input", karate_edg, "--output", str(tmp_path / "x.emb"),
        "--directed", "--extend",
    ])
    with pytest.raises(NotImplementedError):
        cli.read_graph(args)


def test_cli_table_dtype_bf16(tmp_path, karate_edg):
    """--table-dtype bfloat16 trains end to end."""
    from pecanpy_tpu import cli

    out = tmp_path / "k.emb.npz"
    cli.main([
        "--input", karate_edg, "--output", str(out),
        "--dimensions", "8", "--walk-length", "6", "--num-walks", "1",
        "--window-size", "3", "--random_state", "0",
        "--table-dtype", "bfloat16",
    ])
    z = np.load(out)
    assert z["data"].shape == (34, 8)
    assert np.isfinite(z["data"]).all()


def test_cli_walks_task(tmp_path, karate_edg):
    """--task walks writes one node-ID walk per line; every consecutive
    pair is a real edge."""
    from pecanpy_tpu import cli, graph

    out = tmp_path / "karate.walks"
    cli.main([
        "--input", karate_edg, "--output", str(out),
        "--task", "walks", "--walk-length", "6", "--num-walks", "2",
        "--random_state", "0",
    ])
    adj = graph.AdjlstGraph()
    adj.read(karate_edg, weighted=False, directed=False)
    idmap = {nid: i for i, nid in enumerate(adj.nodes)}
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 34 * 2
    for line in lines:
        toks = line.split()
        assert 1 <= len(toks) <= 7
        for a, b in zip(toks, toks[1:]):
            assert idmap[b] in adj._adj[idmap[a]], f"non-edge {a}->{b}"


def test_cli_trainer_sequential(tmp_path, karate_edg):
    """--trainer sequential runs the native host trainer end to end."""
    from pecanpy_tpu import cli
    from pecanpy_tpu.native.loader import native_available

    if not native_available():
        pytest.skip("no native toolchain")
    out = tmp_path / "k.seq.emb.npz"
    cli.main([
        "--input", karate_edg, "--output", str(out),
        "--dimensions", "8", "--walk-length", "6", "--num-walks", "2",
        "--window-size", "3", "--random_state", "0",
        "--trainer", "sequential", "--workers", "2",
    ])
    z = np.load(out)
    assert z["data"].shape == (34, 8)
    assert np.isfinite(z["data"]).all()
    assert np.abs(z["data"]).sum() > 0


def test_cli_trainer_sequential_rejects_devices(tmp_path, karate_edg):
    from pecanpy_tpu import cli

    with pytest.raises(ValueError, match="sequential"):
        cli.main([
            "--input", karate_edg, "--output", str(tmp_path / "x.npz"),
            "--trainer", "sequential", "--devices", "2",
        ])


def test_cli_profile_flag(tmp_path, karate_edg):
    """--profile captures a jax.profiler trace of the pipeline."""
    import os

    from pecanpy_tpu import cli

    out = tmp_path / "k.emb.npz"
    trace = tmp_path / "trace"
    cli.main([
        "--input", karate_edg, "--output", str(out),
        "--dimensions", "8", "--walk-length", "5", "--num-walks", "1",
        "--window-size", "3", "--random_state", "0",
        "--profile", str(trace),
    ])
    assert np.load(out)["data"].shape == (34, 8)
    files = [f for _, _, fs in os.walk(trace) for f in fs]
    assert files, "no trace files written"
