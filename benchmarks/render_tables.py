#!/usr/bin/env python
"""Render RESULTS.md tables from the benchmark JSONs.

VERDICT r3 weak #1 was a RESULTS.md serving table that no longer
matched the JSON it cited (two runs under two semantics mixed by
hand).  This renders the markdown FROM the recorded files, so the
table is the JSON: re-run the benchmark, re-run this, paste the block.

Usage:  python benchmarks/render_tables.py [serving|h2h|findk1m]
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


def serving():
    d = _load("results_serving.json")
    c = d["config"]
    print(f"Model: K={c['K']}, V={c['V']:,}, fit on N={c['N_fit']:,}; "
          f"serve N={c['N_serve']:,} unseen docs "
          f"({c['tokens_per_doc']} tokens each).\n")
    print("| path | number |")
    print("|---|---|")
    b = d["bulk"]
    print(f"| bulk, end-to-end (list docs → theta) | "
          f"{b['warm_docs_per_sec']:,.0f} docs/s warm "
          f"(cold {b['cold_seconds']:.1f} s incl. compile) |")
    p = d["bulk_preencoded"]
    print(f"| bulk, pre-encoded (`PaddedCorpus` in, host encode paid once) "
          f"| **{p['docs_per_sec']:,.0f} docs/s** "
          f"(encode {p['host_encode_seconds']:.1f} s one-time) |")
    r = d["raw_text_end_to_end"]
    print(f"| raw text end-to-end (`infer_text`: tokenize + C++ encode + "
          f"infer) | **{r['docs_per_sec']:,.0f} docs/s** warm "
          f"({r['n_docs']:,} docs in {r['seconds']:.2f} s) |")
    for B in ("1", "32", "256"):
        percall = d["online_latency"][B]["median_ms"]
        srv = d["online_latency_server"][B]["median_ms"]
        print(f"| online B={B}, per-call params / `ThetaServer` | "
              f"{percall:.1f} / **{srv:.1f} ms** median |")


def h2h():
    d = _load("results_quality_h2h.json")
    print("| config | framework | heldout LL | coherence | exclusivity | "
          "FREX top-10 | fit wall-clock |")
    print("|---|---|---|---|---|---|---|")
    for name, e in d["configs"].items():
        for fw in ("strutopy_tpu", "reference"):
            r = e[fw]
            if fw == "strutopy_tpu":
                wall = (f"{r['fit_beta_seconds_warm'] + r['fit_theta_seconds_warm']:.1f} s warm "
                        f"({r['fit_beta_seconds_cold'] + r['fit_theta_seconds_cold']:.0f} s cold)")
            else:
                wall = f"{r['fit_beta_seconds'] + r['fit_theta_seconds']:,.0f} s"
            bold = "**" if fw == "strutopy_tpu" else ""
            print(f"| {name} (N={e['N']:,}, K={e['K']}) | {fw} | "
                  f"{bold}{r['heldout_ll']:.4f}{bold} | "
                  f"{r['semantic_coherence_mean']:.2f} | "
                  f"{r['exclusivity_mean']:.2f} | "
                  f"{r['frex_top10_mean']:.3f} | {wall} |")
        print(f"| | Δ heldout (ours − ref) | "
              f"**{e['heldout_delta_ours_minus_ref']:+.4f}** | | | | |")


def findk1m():
    d = _load("results_findk_1m.json")
    print("| K | heldout (mean ± SE) | coherence | exclusivity | fit s | "
          "transform s |")
    print("|---|---|---|---|---|---|")
    for k, r in sorted(d["by_K"].items(), key=lambda kv: int(kv[0])):
        print(f"| {k} | {r['heldout_mean']:.4f} ± {r['heldout_se']:.5f} | "
              f"{r['coherence']:.2f} | {r['exclusivity']:.2f} | "
              f"{r['fit_seconds']:,.0f} | {r['transform_seconds']:.0f} |")
    print(f"\nselected: argmax K={d['selected_K_argmax']}, "
          f"1-SE K={d['selected_K_1se']} "
          f"(threshold {d['one_se_threshold']:.4f})")
    if d.get("seed_sensitivity"):
        for k, r in sorted(d["seed_sensitivity"].items(),
                           key=lambda kv: int(kv[0])):
            print(f"seed refit K={k} (random init): "
                  f"{r['heldout_mean']:.4f} ± {r['heldout_se']:.5f}")


def h2h_spectral():
    d = _load("results_quality_h2h_spectral.json")
    print("| config | framework | heldout LL | coherence | exclusivity | "
          "FREX top-10 | fit wall-clock |")
    print("|---|---|---|---|---|---|---|")
    for name, e in d["configs"].items():
        for fw in ("strutopy_tpu", "reference"):
            if fw not in e:
                continue
            r = e[fw]
            if fw == "strutopy_tpu":
                wall = (f"{r['fit_beta_seconds_cold'] + r['fit_theta_seconds_cold']:.0f} s cold "
                        f"(incl. compile)")
            else:
                wall = f"{r['fit_beta_seconds'] + r['fit_theta_seconds']:,.0f} s"
            bold = "**" if fw == "strutopy_tpu" else ""
            print(f"| {name} (N={e['N']:,}, K={e['K']}) | {fw} | "
                  f"{bold}{r['heldout_ll']:.4f}{bold} | "
                  f"{r['semantic_coherence_mean']:.2f} | "
                  f"{r['exclusivity_mean']:.2f} | "
                  f"{r['frex_top10_mean']:.3f} | {wall} |")
        if "heldout_delta_ours_minus_ref" in e:
            print(f"| | Δ heldout (ours − ref) | "
                  f"**{e['heldout_delta_ours_minus_ref']:+.4f}** | | | | |")


def alignment():
    d = _load("results_spectral_alignment.json")
    wiki = {
        "stageBC_fit_untempered":
            "untempered, gram_norm=none (= the reference's exact init)",
        "stageBC_fit_temper_0.6": "temper 0.6",
        "stageBC_fit_temper_0.45": "temper 0.45",
        "stageBC_fit_temper_0.3": "temper 0.3",
        "stageBC_fit_temper_0.6_l1": "temper 0.6 + gram_norm=l1",
        "stageBC_fit_temper_0.45_l1": "temper 0.45 + gram_norm=l1",
        "stageD_shared_train_init":
            "shared train-docs init via init_beta (untempered)",
    }
    synth = {
        "stageD_shared_train_init_synth":
            "shared train-docs init via init_beta (untempered)",
        "stageD_shared_train_init_synth_temper_0.6":
            "shared train-docs init + temper 0.6",
        "stageD_shared_train_init_synth_temper_0.45":
            "shared train-docs init + temper 0.45",
        "stageD_shared_train_init_synth_temper_0.3":
            "shared train-docs init + temper 0.3",
    }
    for title, labels, ref in (("wiki K=50", wiki, "−8.564"),
                               ("synth K=100 N=4,096", synth, "−9.113")):
        print(f"\n{title}:\n")
        print("| cell | fitted-beta matched cosine | heldout LL |")
        print("|---|---|---|")
        for key, label in labels.items():
            if key not in d:
                continue
            r = d[key]
            print(f"| {label} | {r['fitted_beta_mean_matched_cosine']:.3f} | "
                  f"{r['heldout_ll']:.3f} |")
        print(f"| reference (its own fits, from the h2h) | — | {ref} |")


def k400finalize():
    d = _load("results_k400_finalize.json")
    print("| finalize variant | docs/s | bound |")
    print("|---|---|---|")
    for name, r in d.items():
        if name == "config":
            continue
        if "compile_failed" in r:
            print(f"| {name} | compile failed | {r['compile_failed'][:60]} |")
        else:
            print(f"| {name} | {r['docs_per_sec']:,.0f} | {r['bound']:,.0f} |")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "serving"
    {"serving": serving, "h2h": h2h, "findk1m": findk1m,
     "h2h_spectral": h2h_spectral, "k400finalize": k400finalize,
     "alignment": alignment}[which]()
