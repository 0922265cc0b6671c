"""Build the rendered documentation site (docs/site/*.html).

The reference ships a rendered sphinx tree with a benchmarks page
(``/root/reference/sphinx-docs/source/``, ``benchmarks.html``); this
repo's docs are markdown-first, and this generator renders them to a
static HTML site with the stdlib-adjacent ``markdown`` + ``pygments``
packages (no sphinx in the image, and installs are off-limits).

Pages: every guide in ``docs/``, the repo-level README / CHANGELOG /
ROADMAP / PARITY, and a **generated benchmarks page** that renders the
committed measurement artifacts (``benchmarks/*.json``) into tables --
the rendered-benchmarks parity point.

Run:  python docs/build_site.py        (writes docs/site/)
CI runs it on every push (docs job) and uploads the site artifact.
"""

import html
import json
import os
import re

import markdown

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(ROOT, "docs")
OUT = os.path.join(DOCS, "site")

# (source path relative to ROOT, output name, nav title)
PAGES = [
    ("docs/index.md", "index.html", "Overview"),
    ("README.md", "readme.html", "README"),
    ("docs/building_a_model.md", "building_a_model.html",
     "Building a model"),
    ("docs/running.md", "running.html", "Running simulations"),
    ("docs/coarse_graining.md", "coarse_graining.html",
     "Coarse-graining"),
    ("docs/migrating_from_hoomd_tf.md", "migrating.html",
     "Migrating from hoomd-tf"),
    ("docs/performance.md", "performance.html", "TPU performance notes"),
    ("docs/testing.md", "testing.html", "Testing"),
    (None, "benchmarks.html", "Benchmarks (measured)"),
    ("PARITY.md", "parity.html", "Reference parity map"),
    ("CHANGELOG.md", "changelog.html", "Changelog"),
    ("ROADMAP.md", "roadmap.html", "Roadmap"),
]

TEMPLATE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — hoomd_tf_tpu</title>
<style>
:root {{ --fg:#1a1d21; --bg:#ffffff; --muted:#5c6570; --line:#e3e6ea;
        --accent:#0b57d0; --code-bg:#f6f8fa; }}
* {{ box-sizing:border-box; }}
body {{ margin:0; font:16px/1.6 system-ui,-apple-system,"Segoe UI",
       sans-serif; color:var(--fg); background:var(--bg); }}
.wrap {{ display:flex; min-height:100vh; }}
nav {{ width:240px; flex:none; border-right:1px solid var(--line);
      padding:24px 16px; position:sticky; top:0; height:100vh;
      overflow-y:auto; }}
nav h1 {{ font-size:17px; margin:0 0 4px; }}
nav .sub {{ color:var(--muted); font-size:12.5px; margin-bottom:16px; }}
nav a {{ display:block; padding:5px 8px; border-radius:6px;
        color:var(--fg); text-decoration:none; font-size:14px; }}
nav a:hover {{ background:var(--code-bg); }}
nav a.here {{ color:var(--accent); font-weight:600;
             background:var(--code-bg); }}
main {{ flex:1; min-width:0; max-width:860px; padding:32px 40px 80px; }}
main h1,main h2,main h3 {{ line-height:1.25; }}
main h1 {{ font-size:28px; }}
main h2 {{ margin-top:2em; border-bottom:1px solid var(--line);
          padding-bottom:4px; }}
a {{ color:var(--accent); }}
pre {{ background:var(--code-bg); border:1px solid var(--line);
      border-radius:8px; padding:12px 14px; overflow-x:auto;
      font-size:13.5px; line-height:1.5; }}
code {{ font-family:ui-monospace,SFMono-Regular,Menlo,monospace;
       font-size:0.92em; background:var(--code-bg);
       padding:1px 4px; border-radius:4px; }}
pre code {{ background:none; padding:0; }}
table {{ border-collapse:collapse; margin:1em 0; font-size:14.5px;
        display:block; overflow-x:auto; }}
th,td {{ border:1px solid var(--line); padding:6px 10px;
        text-align:left; vertical-align:top; }}
th {{ background:var(--code-bg); }}
blockquote {{ margin:1em 0; padding:2px 16px; color:var(--muted);
             border-left:3px solid var(--line); }}
.note {{ color:var(--muted); font-size:13px; }}
{pygments}
</style></head><body><div class="wrap">
<nav><h1>hoomd_tf_tpu</h1>
<div class="sub">TPU-native ML+MD framework</div>
{nav}</nav>
<main>{body}</main>
</div></body></html>
"""


def pygments_css():
    try:
        from pygments.formatters import HtmlFormatter
        return HtmlFormatter(style="default").get_style_defs(
            ".codehilite")
    except Exception:
        return ""


def nav_html(current):
    out = []
    for _, name, title in PAGES:
        cls = ' class="here"' if name == current else ""
        out.append(f'<a href="{name}"{cls}>{html.escape(title)}</a>')
    return "\n".join(out)


_LINK_MAP = {os.path.basename(src): out
             for src, out, _ in PAGES if src}
_LINK_MAP.update({"README.md": "readme.html"})


def rewrite_links(body_html):
    """Point intra-doc .md links at their rendered pages."""
    def sub(m):
        target = m.group(1).split("/")[-1]
        return 'href="%s"' % _LINK_MAP.get(target, m.group(0)[6:-1])
    return re.sub(r'href="([^"#]+\.md)"', sub, body_html)


def render_markdown(text):
    md = markdown.Markdown(extensions=[
        "extra", "toc", "sane_lists", "codehilite"],
        extension_configs={"codehilite": {"guess_lang": False}})
    return md.convert(text)


def table(rows, cols):
    """rows: list of dicts; cols: list of (key, header)."""
    h = ["<table><thead><tr>"]
    for _, label in cols:
        h.append(f"<th>{html.escape(label)}</th>")
    h.append("</tr></thead><tbody>")
    for r in rows:
        h.append("<tr>")
        for key, _ in cols:
            v = r.get(key, "")
            if isinstance(v, float):
                v = f"{v:,.2f}" if abs(v) < 100 else f"{v:,.1f}"
            elif isinstance(v, list):
                v = ", ".join(str(x) for x in v)
            h.append(f"<td>{html.escape(str(v))}</td>")
        h.append("</tr>")
    h.append("</tbody></table>")
    return "".join(h)


def benchmarks_page():
    """Render the committed measurement artifacts, like the
    reference's sphinx benchmarks.html -- but every number on this
    page is a committed, reproducible artifact in benchmarks/."""
    b = os.path.join(ROOT, "benchmarks")

    def load(name):
        p = os.path.join(b, name)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    parts = ["<h1>Benchmarks (measured)</h1>",
             "<p>Every table renders a committed JSON artifact from "
             "<code>benchmarks/</code>; the scripts beside them "
             "reproduce it. Protocols and the full measurement "
             "history live in "
             '<a href="performance.html">TPU performance notes</a>.'
             "</p>"]

    d = load("scale.json")
    if d:
        parts.append("<h2>Single-chip size scaling "
                     "(<code>scale.json</code>)</h2>")
        parts.append(f'<p class="note">{html.escape(d["metric"])}; '
                     f'device {html.escape(str(d["device"]))}.</p>')
        parts.append(table(d["rows"], [
            ("n_particles", "particles"),
            ("steps_per_s", "steps/s"),
            ("particle_steps_per_s_vs_reference", "vs reference (x)"),
            ("plan_grid", "plan grid"),
            ("plan_capacity", "capacity")]))

    d = load("north_star.json")
    if d:
        parts.append("<h2>Online CG force matching "
                     "(<code>north_star.json</code>)</h2>")
        parts.append(f'<p class="note">{html.escape(d["metric"])}.</p>')
        parts.append(table(d["results"], [
            ("n_particles", "particles"),
            ("model", "model route"),
            ("train_steps_per_s", "train steps/s"),
            ("wall_s_per_1000_train_steps", "s / 1000 train steps"),
            ("loss_before", "loss before"),
            ("loss_after", "loss after")]))
        est = d.get("gpu_hoomd_tf_estimate", {})
        if est:
            parts.append(
                '<p class="note">GPU HOOMD-TF comparison bound: '
                f'{est.get("gpu_hoomd_tf_train_steps_per_s_upper_bound")}'
                " train-steps/s (derivation in the artifact).</p>")

    d = load("results-tpu.json")
    if d and isinstance(d, dict) and d.get("results"):
        parts.append("<h2>Benchmark protocol rows "
                     "(<code>results-tpu.json</code>)</h2>")
        rows = d["results"]
        cols = [("n_particles", "particles"), ("model", "model"),
                ("nlist_mode", "nlist"), ("steps_per_s", "steps/s")]
        have = {k for r in rows for k in r}
        cols = [c for c in cols if c[0] in have]
        parts.append(table(rows, cols))

    d = load("sharded_scale.json")
    if d:
        parts.append("<h2>Sharded-engine scaling, virtual 8-device "
                     "mesh (<code>sharded_scale.json</code>)</h2>")
        parts.append(f'<p class="note">{html.escape(d["protocol"])}'
                     "</p>")
        parts.append(table(d["rows"], [
            ("n", "particles"), ("devices", "devices"),
            ("single_ms", "single ms/step"),
            ("sharded_ms", "sharded ms/step"),
            ("speedup", "speedup")]))

    d = load("plan_sweep.json")
    if d:
        parts.append("<h2>Plan-sweep cost-model validation "
                     "(<code>plan_sweep.json</code>)</h2>")
        parts.append(f'<p class="note">{html.escape(d["metric"])}</p>')
        parts.append(table(d["rows"], [
            ("n_particles", "particles"), ("grid", "grid"),
            ("capacity", "capacity"),
            ("padded_lanes_M", "padded lanes (M)"),
            ("predicted_pair_ms", "predicted pair ms"),
            ("measured_ms_per_step", "measured ms/step"),
            ("steps_per_s", "steps/s")]))

    return "\n".join(parts)


def main():
    os.makedirs(OUT, exist_ok=True)
    css = pygments_css()
    for src, name, title in PAGES:
        if src is None:
            body = benchmarks_page()
        else:
            with open(os.path.join(ROOT, src)) as f:
                body = render_markdown(f.read())
            body = rewrite_links(body)
        page = TEMPLATE.format(title=html.escape(title),
                               nav=nav_html(name), body=body,
                               pygments=css)
        with open(os.path.join(OUT, name), "w") as f:
            f.write(page)
        print("wrote", os.path.join("docs/site", name))


if __name__ == "__main__":
    main()
