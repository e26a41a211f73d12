"""CLI parser compatibility tests (`main.py:24-65` flags)."""
from gnn_tpu.cli import build_parser


def test_reference_flags_accepted():
    p = build_parser()
    a = p.parse_args([
        "--dataset", "reddit", "--model", "graphsage", "--nhid", "512",
        "--epoch_num", "30", "--pool_num", "4", "--batch_size", "512",
        "--orders", "1,1,1", "--samp_num", "8192", "--cuda", "0,1,2,3",
        "--local_shuffle", "--buffer_size", "0.1", "--scale_factor", "2",
        "--lr", "0.04", "--test", "--alpha", "0.9", "--sampler", "ladies",
        "--pagraph", "--locality_sampling"])
    assert a.samp_num == 8192 and a.buffer_size == 0.1
    assert a.pagraph and a.local_shuffle and a.locality_sampling
    assert a.cuda == "0,1,2,3"  # accepted for compatibility


def test_orders_zero_semantics():
    a = build_parser().parse_args(["--orders", "0,1,1"])
    orders = tuple(int(t) for t in a.orders.split(","))
    assert orders == (0, 1, 1)
