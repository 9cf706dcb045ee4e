"""Run the reference's OWN config end to end through the tiger-tpu CLI.

The reference ships data/config.yaml — the schema its C++ config loader was
written for but never wired into main.cpp — together with its real inputs:
small_test.csv (9 links of the Delaware basin) and the full 41,274-row
pr/t2m remap lookups.  This tool runs that exact configuration through
tiger_tpu.run with only the adjustments the reference's own repo forces:

  - paths: the YAML points at machine-local folders
    (/data/forcings/2021, params/stream_params.csv, forcings_lookup.csv);
    they are rewritten to the shipped files + a synthesized forcing folder.
  - forcings: the reference repo ships no NetCDF grids, so an ERA5-Land-
    shaped folder (PRCP hourly / Tair daily over the Jan-Oct 2021 span,
    grid sized to the lookups' lat/lon extents) is synthesized; discovery
    runs through the config's own folder_nc + vars mechanism.
  - initial: mode hot points at inits/inicond_204.uini, which the reference
    repo does not contain — mode cold with the reference driver's own
    cold-start state (main.cpp:377) is used instead.

Everything else — the 9-month span, hourly print interval, the positional
local_params.columns mapping, global_params, rtol 1e-6 / atol 1e-9,
explicit states list — runs as the reference declared it.

Writes benchmarks/reference_config_e2e.json (committed artifact) + the
final-state NetCDF next to it.

Usage: python tools/run_reference_config.py [--ref /root/reference/data]
                                            [--keep] [--out-json PATH]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ref", default="/root/reference/data")
    p.add_argument("--keep", action="store_true")
    p.add_argument(
        "--out-json",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "reference_config_e2e.json",
        ),
    )
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import yaml

    from tiger_tpu.config import load_config
    from tiger_tpu.io.netcdf import write_grid_forcing
    from tiger_tpu.run import run

    with open(os.path.join(args.ref, "config.yaml")) as f:
        doc = yaml.safe_load(f)

    # Grid extents from the reference's own lookups, restricted to the
    # streams small_test.csv actually contains.
    import csv

    with open(os.path.join(args.ref, "small_test.csv")) as f:
        streams = {row["stream"] for row in csv.DictReader(f)}
    lat_hi = lon_hi = 0
    with open(os.path.join(args.ref, "small_example_pr_lookup.csv")) as f:
        for row in csv.DictReader(f):
            if row["stream"] in streams:
                lat_hi = max(lat_hi, int(row["lat_index"]))
                lon_hi = max(lon_hi, int(row["lon_index"]))
    n_lat, n_lon = lat_hi + 1, lon_hi + 1

    base = tempfile.mkdtemp(prefix="tiger_refcfg_")
    try:
        # Jan 1 - Oct 1 2021 (the config's own span): 273 days.
        days = (np.datetime64("2021-10-01") - np.datetime64("2021-01-01")).astype(int)
        rng = np.random.default_rng(2021)
        t_h = np.arange(days * 24, dtype=np.float64)
        # Seasonal hourly precipitation [m/hr -> mm/hr units handled by c1]
        season = 1.0 + 0.6 * np.sin(2 * np.pi * (t_h / 24.0) / 365.0)
        pr = (
            rng.gamma(0.35, 1.0, (days * 24, n_lat, n_lon)).astype(np.float32)
            * season[:, None, None]
            * 0.0005
        )
        t_d = np.arange(days, dtype=np.float64)
        tair = (
            6.0
            - 12.0 * np.cos(2 * np.pi * (t_d + 0) / 365.0)[:, None, None]
            + rng.normal(0, 2.0, (days, n_lat, n_lon))
        ).astype(np.float32)
        forc_dir = os.path.join(base, "forcings_2021")
        os.makedirs(forc_dir)
        write_grid_forcing(
            os.path.join(forc_dir, "PRCP_2021.nc"), "PRCP", pr,
            time_vals=t_h, time_attrs={"units": "hours since 2021-01-01"},
        )
        write_grid_forcing(
            os.path.join(forc_dir, "Tair_2021.nc"), "Tair", tair,
            time_vals=t_d, time_attrs={"units": "days since 2021-01-01"},
        )

        # Path adjustments (see module docstring); everything else verbatim.
        doc["local_params"]["file"] = os.path.join(args.ref, "small_test.csv")
        doc["forcings"]["path"] = forc_dir
        doc["forcings"]["lookup"] = os.path.join(
            args.ref, "small_example_pr_lookup.csv"
        )
        doc["initial"] = {"mode": "cold"}
        doc["output"]["path"] = os.path.join(base, "out")
        doc["output"]["prefix"] = "refcfg"
        cfg_path = os.path.join(base, "config.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(doc, f)

        cfg = load_config(cfg_path)
        assert cfg.solver.rtol == 1e-6 and cfg.solver.atol == 1e-9
        assert cfg.params_columns is not None  # positional mapping exercised
        summary = run(cfg, use_mesh=False)

        import h5py

        final_path = summary["final_path"]
        with h5py.File(final_path) as f:
            y_final = np.asarray(f["outputs"])
            links = np.asarray(f["system"])
        dense_path = summary["dense_path"]
        with h5py.File(dense_path) as f:
            dense = np.asarray(f["outputs"])
        assert np.isfinite(y_final).all(), "unfinished lanes in final state"
        # ---- distinct-per-link VARIANT (round 5): the baseline's ten
        # bit-identical y_final rows are EXPECTED (see identical_finals
        # note), but identical rows are also what a broken grid->link remap
        # would produce — so a second pass perturbs the per-link params AND
        # assigns each link its own grid cell in a variant lookup, making
        # every trajectory distinct.  A remap or param-row mixup now changes
        # rows detectably.
        import csv as _csv

        var_params = os.path.join(base, "params_variant.csv")
        with open(os.path.join(args.ref, "small_test.csv")) as f:
            rows_p = list(_csv.reader(f))
        hdr = rows_p[0]
        hu_col = hdr.index("hu")
        for i, row in enumerate(rows_p[1:]):
            row[hu_col] = str(float(row[hu_col]) * (1.0 + 0.05 * i))
        with open(var_params, "w", newline="") as f:
            _csv.writer(f).writerows(rows_p)
        var_lookup = os.path.join(base, "lookup_variant.csv")
        link_order = [row[hdr.index("stream")] for row in rows_p[1:]]
        with open(var_lookup, "w") as f:
            f.write("stream,lat_index,lon_index\n")
            for i, sid in enumerate(link_order):
                f.write(f"{sid},{lat_hi},{min(i, lon_hi)}\n")
        doc["local_params"]["file"] = var_params
        doc["forcings"]["lookup"] = var_lookup
        doc["output"]["path"] = os.path.join(base, "out_variant")
        cfg_v_path = os.path.join(base, "config_variant.yaml")
        with open(cfg_v_path, "w") as f:
            yaml.safe_dump(doc, f)
        summary_v = run(load_config(cfg_v_path), use_mesh=False)
        with h5py.File(summary_v["final_path"]) as f:
            y_final_v = np.asarray(f["outputs"])
        assert np.isfinite(y_final_v).all()
        n_distinct = len({tuple(np.round(r, 10)) for r in y_final_v})
        assert n_distinct == len(y_final_v), (
            f"variant rows not distinct ({n_distinct}/{len(y_final_v)}): "
            "per-link params/remap not reaching the trajectories"
        )

        out = {
            "metric": "reference_config_e2e",
            "identical_finals_note": (
                "The baseline y_final rows are bit-identical by "
                "construction, NOT a remap bug: small_test.csv's links "
                "share every physics parameter (only stream ids and "
                "routing geometry differ), and the reference's own lookups "
                "map all ten links to ONE grid cell (lat 28, lon 39 in "
                "small_example_pr_lookup.csv), so every lane integrates "
                "the same ODE.  The 'variant' section below perturbs "
                "per-link Hu AND assigns distinct grid cells; its rows "
                "must be pairwise distinct, which a broken remap or "
                "param-row mixup would violate."
            ),
            "variant": {
                "params": "hu scaled by (1 + 0.05*i) per link",
                "lookup": "one distinct grid cell per link",
                "n_stiff": summary_v["n_stiff"],
                "n_failed": summary_v["n_failed"],
                "distinct_final_rows": int(n_distinct),
                "y_final": np.round(y_final_v, 8).tolist(),
            },
            "notes": (
                "n_stiff == num_systems is correct behavior, not a failure: "
                "with winter temperatures (T<0) Model 204's ET term "
                "e_max=min(0.1*T, h_static) flips sign (model_204.hpp:96) "
                "and h_static grows exponentially to the x2=max(0, "
                "x1+h_static-Hu) spillover kink (Hu=178 in small_test.csv), "
                "where the dynamics equilibrate with a ~1/min eigenvalue — "
                "mildly stiff over the config's 9-month span (>=120k "
                "explicit steps).  The stability-boundary detector hands "
                "those lanes to Radau, which finishes them; n_failed is 0 "
                "and the dense record is complete."
            ),
            "config": os.path.join(args.ref, "config.yaml"),
            "params_file": "small_test.csv (9 links, positional columns)",
            "lookup_rows": 41274,
            "span_days": int(days),
            "rtol": 1e-6,
            "atol": 1e-9,
            "num_systems": summary["num_systems"],
            "n_stiff": summary["n_stiff"],
            "n_failed": summary["n_failed"],
            "query_rows": int(dense.shape[1]),
            "links": links.tolist(),
            "y_final": np.round(y_final, 8).tolist(),
            "dense_sha256": hashlib.sha256(
                np.ascontiguousarray(dense)
            ).hexdigest(),
            "wall_phases_s": {
                k: round(v, 3) for k, v in summary.items()
                if k.endswith("_s") and isinstance(v, (int, float))
            },
        }
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)
        shutil.copy(
            final_path,
            os.path.join(os.path.dirname(args.out_json), "reference_config_final.nc"),
        )
        print(json.dumps({k: out[k] for k in (
            "metric", "num_systems", "span_days", "n_stiff", "n_failed",
            "query_rows",
        )}))
    finally:
        if not args.keep:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
