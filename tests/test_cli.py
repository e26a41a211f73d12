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


def test_model_dependent_lr_defaults():
    """GAT defaults to lr 0.002 + warmup (flat 0.01 saturates at
    canonical scale — RESULTS.md round 5); reference models keep the
    reference's 0.01; explicit --lr always wins."""
    from gnn_tpu.cli import resolve_training_defaults
    p = build_parser()

    a = p.parse_args(["--dataset", "x", "--model", "graphsage"])
    wu = resolve_training_defaults(a)
    assert (a.lr, wu) == (0.01, 0)

    a = p.parse_args(["--dataset", "x", "--model", "gat"])
    wu = resolve_training_defaults(a)
    assert (a.lr, wu) == (0.002, 300)

    # auto warmup caps at one epoch of steps (tiny runs must not spend
    # the whole run at lr/100)
    a = p.parse_args(["--dataset", "x", "--model", "gat"])
    wu = resolve_training_defaults(a, steps_per_epoch=16)
    assert wu == 16

    a = p.parse_args(["--dataset", "x", "--model", "gat",
                      "--lr", "0.04", "--lr_warmup", "0"])
    wu = resolve_training_defaults(a)
    assert (a.lr, wu) == (0.04, 0)
