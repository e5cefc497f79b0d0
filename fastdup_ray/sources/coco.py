"""COCO-format annotation import and COCO/CVAT export (SURVEY.md
S10/K8/K9).

Reference shape:
  - S10: `convert_coco_dict_to_df` (utils.py:518-565) merges the COCO
    dict's images/annotations/categories into one flat annotation df
    (filename, col_x, row_y, width, height, label).
  - K9: `export_to_coco` (models_utils.py:9-76) writes the df back out
    as COCO json with dense image/annotation/category ids.
  - K8: `do_export_to_cvat` (cvat.py:76-302) writes an annotations XML
    for the CVAT labeling tool.

Text-native mapping: `file_name` -> `url`; a bbox (x, y, w, h) maps to
a char span (span_start=x, span_len=w) with (row_y, height) carried
through verbatim for round-trip fidelity with image producers. The
resulting table is the engine's standard annotation side table (K4,
`stages/annotations.py`) keyed by url.

COCO/CVAT files are metadata-sized side artifacts (the reference holds
them in a single in-memory df too); import parses driver-side then
hands a Dataset to the engine, export collects the side table. The
corpus itself never flows through this module.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET

import pyarrow as pa


def coco_dict_to_table(coco: dict) -> pa.Table:
    """COCO dict -> flat annotation table (url, label, span_start,
    span_len, row_y, height). S10 analog of utils.convert_coco_dict_to_df
    (utils.py:518-565), same images⋈annotations⋈categories merge."""
    for key in ("images", "annotations", "categories"):
        if key not in coco:
            raise ValueError(f"invalid COCO dict: missing {key!r}")
    img_by_id = {im["id"]: im for im in coco["images"]}
    cat_by_id = {c["id"]: c["name"] for c in coco["categories"]}
    urls, labels, xs, ys, ws, hs = [], [], [], [], [], []
    for ann in coco["annotations"]:
        im = img_by_id.get(ann["image_id"])
        if im is None:
            raise ValueError(f"annotation {ann.get('id')} references "
                             f"unknown image_id {ann['image_id']}")
        x, y, w, h = ann["bbox"]
        urls.append(im["file_name"])
        labels.append(cat_by_id.get(ann["category_id"], ""))
        xs.append(int(x))
        ys.append(int(y))
        ws.append(int(w))
        hs.append(int(h))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "label": pa.array(labels, pa.string()),
        "span_start": pa.array(xs, pa.int64()),
        "row_y": pa.array(ys, pa.int64()),
        "span_len": pa.array(ws, pa.int64()),
        "height": pa.array(hs, pa.int64()),
    })


def read_coco_annotations(path: str):
    """COCO json file -> annotation Dataset (S10)."""
    import ray.data as rd

    with open(path) as f:
        coco = json.load(f)
    return rd.from_arrow(coco_dict_to_table(coco))


def _collect(annotations) -> pa.Table:
    if isinstance(annotations, pa.Table):
        return annotations
    import ray

    blocks = ray.get(annotations.to_arrow_refs())
    nonempty = [b for b in blocks if b.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="default")
    if blocks:
        return blocks[0]
    raise ValueError("cannot export an annotation Dataset with no blocks")


def export_coco(annotations, json_path: str) -> dict:
    """Annotation table/Dataset (url, label, span_start, span_len
    [, row_y, height]) -> COCO json (K9 analog of models_utils.py:9-76:
    dense 1-based image/annotation ids, categories sorted by name).

    Returns the written dict (for tests / chaining)."""
    tbl = _collect(annotations)
    cols = set(tbl.column_names)
    need = {"url", "label", "span_start", "span_len"}
    if not need <= cols:
        raise ValueError(f"need columns {sorted(need)}, got {sorted(cols)}")
    rows = tbl.to_pylist()
    images: list[dict] = []
    img_id: dict[str, int] = {}
    annots: list[dict] = []
    cats = sorted({r["label"] for r in rows})
    cat_id = {name: i for i, name in enumerate(cats, start=1)}
    for r in rows:
        url = r["url"]
        if url not in img_id:
            img_id[url] = len(img_id) + 1
            images.append({"id": img_id[url], "file_name": url})
        x = int(r["span_start"])
        y = int(r.get("row_y") or 0)
        w = int(r["span_len"])
        h = int(r.get("height") or 0)
        annots.append({
            "id": len(annots) + 1,
            "image_id": img_id[url],
            "category_id": cat_id[r["label"]],
            "bbox": [x, y, w, h],
            "area": w * h,
            "iscrowd": 0,
        })
    out = {
        "images": images,
        "annotations": annots,
        "categories": [{"id": i, "name": n} for n, i in cat_id.items()],
    }
    with open(json_path, "w") as f:
        json.dump(out, f)
    return out


def export_cvat(annotations, xml_path: str) -> None:
    """Annotation table/Dataset -> CVAT-style annotations.xml (K8 analog
    of cvat.py:76-302 create_annotations_file): one <image> element per
    url, one <box> child per annotation (span mapped to xtl/xbr)."""
    tbl = _collect(annotations)
    root = ET.Element("annotations")
    ET.SubElement(root, "version").text = "1.1"
    by_url: dict[str, list[dict]] = {}
    for r in tbl.to_pylist():
        by_url.setdefault(r["url"], []).append(r)
    for i, url in enumerate(sorted(by_url)):
        img = ET.SubElement(root, "image", id=str(i), name=url)
        for r in by_url[url]:
            x = int(r["span_start"])
            y = int(r.get("row_y") or 0)
            ET.SubElement(
                img, "box", label=str(r["label"]),
                xtl=str(x), ytl=str(y),
                xbr=str(x + int(r["span_len"])),
                ybr=str(y + int(r.get("height") or 0)),
                occluded="0",
            )
    ET.ElementTree(root).write(xml_path, encoding="unicode",
                               xml_declaration=True)


def export_labelimg(annotations, out_dir: str) -> list[str]:
    """Annotation table/Dataset -> one Pascal-VOC-style labelImg XML per
    url (K8, the analog of reference label_img.py image_to_label_img_xml:
    <annotation><folder><filename><size><object><name><bndbox>). Spans
    map to xmin/xmax, row_y/height to ymin/ymax; one <object> per
    annotation row (the reference emits one whole-image box per file —
    here a url can carry several spans, so each becomes an object).

    Returns the written file paths (sorted by url)."""
    os.makedirs(out_dir, exist_ok=True)
    tbl = _collect(annotations)
    by_url: dict[str, list[dict]] = {}
    for r in tbl.to_pylist():
        by_url.setdefault(r["url"], []).append(r)
    paths = []
    for url in sorted(by_url):
        rows = by_url[url]
        root = ET.Element("annotation")
        ET.SubElement(root, "folder").text = str(rows[0].get("folder") or "unknown")
        ET.SubElement(root, "filename").text = url
        ET.SubElement(root, "path").text = url
        src = ET.SubElement(root, "source")
        ET.SubElement(src, "database").text = "Unknown"
        size = ET.SubElement(root, "size")
        width = max(int(r["span_start"]) + int(r["span_len"]) for r in rows)
        height = max(int(r.get("row_y") or 0) + int(r.get("height") or 0)
                     for r in rows)
        ET.SubElement(size, "width").text = str(width)
        ET.SubElement(size, "height").text = str(height)
        ET.SubElement(size, "depth").text = "1"
        ET.SubElement(root, "segmented").text = "0"
        for r in rows:
            obj = ET.SubElement(root, "object")
            ET.SubElement(obj, "name").text = str(r["label"])
            ET.SubElement(obj, "pose").text = "Unspecified"
            ET.SubElement(obj, "truncated").text = "0"
            ET.SubElement(obj, "difficult").text = "0"
            box = ET.SubElement(obj, "bndbox")
            x = int(r["span_start"])
            y = int(r.get("row_y") or 0)
            ET.SubElement(box, "xmin").text = str(x)
            ET.SubElement(box, "ymin").text = str(y)
            ET.SubElement(box, "xmax").text = str(x + int(r["span_len"]))
            ET.SubElement(box, "ymax").text = str(y + int(r.get("height") or 0))
        # file name: stable digest of the url (urls aren't path-safe)
        import hashlib

        stem = hashlib.sha1(url.encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"{stem}.xml")
        ET.ElementTree(root).write(path, encoding="unicode",
                                   xml_declaration=True)
        paths.append(path)
    return paths


def read_labelimg(xml_dir: str):
    """labelImg/Pascal-VOC XML directory -> annotation Dataset with the
    same columns export_labelimg consumed (url, label, span_start,
    span_len, row_y, height) — the roundtrip reader."""
    import ray.data as rd

    urls, labels, xs, ws, ys, hs = [], [], [], [], [], []
    for name in sorted(os.listdir(xml_dir)):
        if not name.endswith(".xml"):
            continue
        root = ET.parse(os.path.join(xml_dir, name)).getroot()
        url = root.findtext("filename")
        for obj in root.iter("object"):
            box = obj.find("bndbox")
            xmin = int(box.findtext("xmin"))
            ymin = int(box.findtext("ymin"))
            urls.append(url)
            labels.append(obj.findtext("name"))
            xs.append(xmin)
            ws.append(int(box.findtext("xmax")) - xmin)
            ys.append(ymin)
            hs.append(int(box.findtext("ymax")) - ymin)
    return rd.from_arrow(pa.table({
        "url": pa.array(urls, pa.string()),
        "label": pa.array(labels, pa.string()),
        "span_start": pa.array(xs, pa.int64()),
        "span_len": pa.array(ws, pa.int64()),
        "row_y": pa.array(ys, pa.int64()),
        "height": pa.array(hs, pa.int64()),
    }))
