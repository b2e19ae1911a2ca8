"""Operator dashboard (--watch): live lock/C/N0/Doppler/nav table over
host-side telemetry only (the reference's interactive gnuplot views,
src/sdrplot.c:336-394, as a terminal stand-in — see diag/watch.py)."""
import io

import numpy as np

from gnsslib_tpu import sim
from gnsslib_tpu.constants import DType, FrontendType
from gnsslib_tpu.diag.watch import Watch, channel_rows, render_text
from gnsslib_tpu.io.frontend import FileFrontend, FrontendSpec
from gnsslib_tpu.runtime.config import ChannelConfig, ReceiverConfig
from gnsslib_tpu.runtime.receiver import Receiver
from gnsslib_tpu.track.state import TrackConfig

F_SF = 4.092e6
F_IF = 1.023e6
TOW0 = 352800.0


def _run_receiver(tmp_path, seconds=8.0):
    eph = sim.example_eph(prn=5, week=2200, toe_tow=TOW0)
    frames = sim.lnav_bit_stream(eph, TOW0 + 6.0, nframes=2)
    pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
    ch = sim.SimChannel(prn=5, doppler=900.0, code_phase=-80.0,
                        carr_phase=0.2,
                        nav_bits=np.concatenate([pad, frames]))
    noise = sim.noise_std_for_cn0(1.0, 47.0, F_SF, DType.REAL)
    x = sim.synthesize([ch], F_SF, F_IF, DType.REAL, int(seconds * F_SF),
                       noise_std=noise, seed=5)
    path = tmp_path / "watch.bin"
    sim.quantize_int8(x, 16.0).tofile(path)
    spec = FrontendSpec(fend=FrontendType.FILE, f_cf=1.57542e9, f_sf=F_SF,
                        f_if=F_IF, dtype=DType.REAL)
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=5), ChannelConfig(prn=13)],
        fends=[spec], files=[str(path)],
        track=TrackConfig(corrn=4, corrd=2, corrp=2),
        outms=400, rinex=False)
    rx = Receiver(cfg, FileFrontend(str(path), spec))
    frames_seen = []
    watch = Watch(rx, out=io.StringIO(), interval_s=0.2)
    orig_tick = watch.tick

    def tick(t):
        orig_tick(t)
        frames_seen.append(render_text(rx, t))

    watch.tick = tick
    rx.run_seconds(progress=watch.tick)
    rx.flush()
    return rx, watch, frames_seen


def test_dashboard_renders_live_state(tmp_path):
    rx, watch, frames = _run_receiver(tmp_path)
    assert len(frames) >= 10, "SPEC_MS cadence produced too few frames"

    final = render_text(rx, 8.0)
    # header counters
    assert "locked 1/2" in final
    assert "epochs" in final
    # the locked satellite's row: PRN, signal name, live state with
    # C/N0 and a Doppler near the simulated +900 Hz
    rows = channel_rows([rx])
    r5 = next(r for r in rows if r["prn"] == 5)
    r13 = next(r for r in rows if r["prn"] == 13)
    assert r5["state"] in ("track", "nav")
    assert r5["ctype"] == "L1CA"
    assert 35.0 < r5["cn0"] < 60.0
    assert abs(r5["dopp"] - (-900.0)) < 50.0 or \
        abs(r5["dopp"] - 900.0) < 50.0
    assert r5["prompt"] > 0.0
    assert r13["state"] == "idle"
    # the idle channel renders placeholders, not stale numbers
    line13 = [ln for ln in final.splitlines() if ln.startswith("  13")][0]
    assert " - " in line13 or "-" in line13.split()[3]

    # in-place ANSI redraw: frame 2+ moves the cursor up over frame 1
    text = watch.out.getvalue()
    assert "\x1b[J" in text and "\x1b[" in text
    assert text.count("\x1b[J") == len(frames)


def test_dashboard_never_touches_device_state(tmp_path, monkeypatch):
    """render_text must not trigger any device transfer: it sees only
    ChannelRuntime host fields (the round-2 lesson — reading device
    arrays from the progress path serializes the pipeline)."""
    rx, _, _ = _run_receiver(tmp_path, seconds=4.0)
    import jax

    def boom(*a, **k):
        raise AssertionError("dashboard fetched from device")

    monkeypatch.setattr(jax, "device_get", boom)
    out = render_text(rx, 4.0)
    assert "PRN" in out


def test_html_live_view(tmp_path):
    """--watch-html equivalent: the HtmlView rewrites a self-refreshing
    page with the channel table and the acq-surface / correlator /
    spectrum SVGs (diag/htmlview.py — the graphical stand-in for the
    reference's gnuplot windows, src/sdrplot.c:336-394)."""
    from gnsslib_tpu.diag.htmlview import HtmlView, render_html

    eph = sim.example_eph(prn=5, week=2200, toe_tow=TOW0)
    frames = sim.lnav_bit_stream(eph, TOW0 + 6.0, nframes=2)
    pad = np.concatenate([np.tile([1, -1], 149), [1, 1]]).astype(np.int8)
    ch = sim.SimChannel(prn=5, doppler=900.0, code_phase=-80.0,
                        carr_phase=0.2,
                        nav_bits=np.concatenate([pad, frames]))
    noise = sim.noise_std_for_cn0(1.0, 47.0, F_SF, DType.REAL)
    x = sim.synthesize([ch], F_SF, F_IF, DType.REAL, int(6.0 * F_SF),
                       noise_std=noise, seed=5)
    path = tmp_path / "html.bin"
    sim.quantize_int8(x, 16.0).tofile(path)
    spec = FrontendSpec(fend=FrontendType.FILE, f_cf=1.57542e9, f_sf=F_SF,
                        f_if=F_IF, dtype=DType.REAL)
    cfg = ReceiverConfig(
        channels=[ChannelConfig(prn=5), ChannelConfig(prn=13)],
        fends=[spec], files=[str(path)],
        track=TrackConfig(corrn=4, corrd=2, corrp=2),
        outms=400, rinex=False, spec=True)   # spec: views populate
    rx = Receiver(cfg, FileFrontend(str(path), spec))
    out = tmp_path / "live.html"
    view = HtmlView(rx, str(out), interval_s=0.2)
    rx.run_seconds(progress=view.tick)
    rx.flush()
    view.close()

    assert out.exists()
    assert not (tmp_path / "live.html.tmp").exists()   # atomic publish
    page = out.read_text()
    assert 'http-equiv="refresh"' in page
    assert page.count("<svg") >= 3          # spectrum + histogram + views
    assert "locked 1/2" in page
    assert "acquisition @" in page          # pltacq equivalent
    assert "taps @" in page                 # plttrk equivalent
    assert "IF spectrum" in page
    # final render is internally consistent with the live state helpers
    final = render_html(rx, 6.0, 0.2)
    assert "L1CA" in final and ("track" in final or "nav" in final)
