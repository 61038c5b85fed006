"""tools/flop_bound.py smoke: abstract-only analysis, sane numbers."""

import io
import json
import sys

sys.path.insert(0, ".")


def test_flop_bound_smoke(capsys):
    from tools import flop_bound

    flop_bound.main(["--batch", "4", "--frames", "16", "--json"])
    out = capsys.readouterr().out
    data = json.loads(out.strip().splitlines()[-1])
    names = {s["name"] for s in data["stages"]}
    assert {"spectra", "xcorr", "wenergy", "comb", "model"} <= names
    # model FLOPs are analytic 2*MACs*B*T with MACs ~= param count (7.96M)
    model = next(s for s in data["stages"] if s["name"] == "model")
    assert 0.95 * 2 * 7.96e6 * 4 * 16 < model["flops"] < 1.05 * 2 * 7.96e6 * 4 * 16
    # every stage carries both bounds and the max is the bound
    for s in data["stages"]:
        assert s["bound"] >= max(s["t_flop"], s["t_mem"]) * 0.999
        assert s["flops"] >= 0 and s["bytes"] > 0
    assert data["speed_of_light_audio_s_per_s"] > 0
    # serving tier must be strictly faster at the FLOP bound
    flop_bound.main(["--batch", "4", "--frames", "16", "--serving",
                     "--json"])
    out2 = capsys.readouterr().out
    data2 = json.loads(out2.strip().splitlines()[-1])
    assert (data2["speed_of_light_audio_s_per_s"]
            > data["speed_of_light_audio_s_per_s"])
