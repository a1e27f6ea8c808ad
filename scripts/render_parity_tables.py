"""Render BASELINE.md-ready markdown tables from reference_results.json /
baseline_results.json (dev helper for the round-5 documentation pass)."""
import json

ref = json.load(open("/root/repo/reference_results.json"))
rep = json.load(open("/root/repo/baseline_results.json"))


def fmt(x, nd=4):
    return f"{x:.{nd}f}" if isinstance(x, (int, float)) else "—"


print("### ratings3 CTR (3-seed mean [min, max])")
print("| Model | reference | rec_pangu_tpu |")
print("|---|---|---|")
for m in ["DeepFM", "DCN", "xDeepFM", "AutoInt", "FiBiNet", "MaskNet",
          "LR", "FM", "WDL", "NFM", "AFM", "AFN", "AOANet", "CCPM"]:
    a = ref.get(f"ratings3/{m}", {})
    b = rep.get(f"ratings3/{m}", {})
    if not a and not b:
        continue
    sa = (f"{fmt(a.get('auc_mean'))} [{fmt(a.get('auc_min'))}, "
          f"{fmt(a.get('auc_max'))}]" if a else "—")
    sb = (f"{fmt(b.get('auc_mean'))} [{fmt(b.get('auc_min'))}, "
          f"{fmt(b.get('auc_max'))}]" if b else "—")
    print(f"| {m} | {sa} | {sb} |")

print()
print("### seq3 recall@50 (3-seed mean [min, max])")
print("| Model | reference | rec_pangu_tpu |")
print("|---|---|---|")
for m in ["YotubeDNN", "GRU4Rec", "NARM", "ComirecSA", "ComirecDR", "MIND",
          "SASRec", "CLRec", "IOCRec", "SRGNN", "GCSAN", "NISER", "STAMP",
          "NextItNet", "SINE", "Re4", "CMI", "ContraRec"]:
    a = ref.get(f"seq3/{m}", {})
    b = rep.get(f"seq3/{m}", {})
    if not a and not b:
        continue
    sa = (f"{fmt(a.get('recall50_mean'))} [{fmt(a.get('recall50_min'))}, "
          f"{fmt(a.get('recall50_max'))}]" if a else "—")
    sb = (f"{fmt(b.get('recall50_mean'))} [{fmt(b.get('recall50_min'))}, "
          f"{fmt(b.get('recall50_max'))}]" if b else "—")
    print(f"| {m} | {sa} | {sb} |")

print()
print("### mtl3 (3-seed task1/task2 AUC means)")
print("| Model | reference | rec_pangu_tpu |")
print("|---|---|---|")
for m in ["MMOE", "ESSM", "AITM"]:
    a = ref.get(f"mtl3/{m}", {})
    b = rep.get(f"mtl3/{m}", {})
    if not a and not b:
        continue
    sa = (f"{fmt(a.get('task1_auc_mean'))} / {fmt(a.get('task2_auc_mean'))}"
          if a else "—")
    sb = (f"{fmt(b.get('task1_auc_mean'))} / {fmt(b.get('task2_auc_mean'))}"
          if b else "—")
    print(f"| {m} | {sa} | {sb} |")

print()
print("### single-seed legs: sequence extras / MTL extras / graph")
print("| Leg | reference | rec_pangu_tpu |")
print("|---|---|---|")
for m in ["STAMP", "NextItNet", "SINE", "Re4", "CMI", "ContraRec"]:
    a = ref.get(m, {}).get("test", {})
    b = rep.get(m, {}).get("test", {})
    sa = (f"{fmt(a.get('recall@50'))} / {fmt(a.get('ndcg@50'))} / "
          f"{fmt(a.get('hitrate@50'), 2)}" if a else "—")
    sb = (f"{fmt(b.get('recall@50'))} / {fmt(b.get('ndcg@50'))} / "
          f"{fmt(b.get('hitrate@50'), 2)}" if b else "—")
    print(f"| {m} | {sa} | {sb} |")
for m in ["ShareBottom", "OMOE", "MLMMOE"]:
    a = ref.get(f"ratings_mtl/{m}", {}).get("test", {})
    b = rep.get(f"ratings_mtl/{m}", {}).get("test", {})
    sa = (f"{fmt(a.get('test_task1_roc_auc_score'))} / "
          f"{fmt(a.get('test_task2_roc_auc_score'))}" if a else "—")
    sb = (f"{fmt(b.get('test_task1_roc_auc_score'))} / "
          f"{fmt(b.get('test_task2_roc_auc_score'))}" if b else "—")
    print(f"| {m} | {sa} | {sb} |")
a = ref.get("graph/NGCF", {}).get("test", {})
b = rep.get("graph/NGCF", {}).get("test", {})
print(f"| NGCF | {fmt(a.get('recall@50'))} / {fmt(a.get('ndcg@50'))} / "
      f"{fmt(a.get('hitrate@50'), 2)} | {fmt(b.get('recall@50'))} / "
      f"{fmt(b.get('ndcg@50'))} / {fmt(b.get('hitrate@50'), 2)} |")

print()
print("### sampled-CE quality (repo full vs repo sampled, same protocol)")
for m in ["IOCRec", "ComirecSA", "MIND"]:
    full = rep.get(m, {}).get("test", {})
    samp = rep.get(f"sampled/{m}", {}).get("test", {})
    print(f"| {m} | full {fmt(full.get('recall@50'))} | "
          f"sampled {fmt(samp.get('recall@50'))} |")
