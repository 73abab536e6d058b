"""Podcast/corpus crawler interface.

Reference: ttts/spider/ (selenium crawlers for player.fm / ximalaya plus a
plain downloader). Neither selenium nor network egress exists in this image,
so this module defines the pipeline contract with injectable fetchers; the
URL bookkeeping, resume-after-crash, and download loop are real and tested.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Callable, Iterable, List, Optional

log = logging.getLogger(__name__)

FetchFn = Callable[[str], bytes]
ListingFn = Callable[[str], List[str]]


def default_fetch(url: str) -> bytes:
    import urllib.request
    with urllib.request.urlopen(url, timeout=30) as r:  # pragma: no cover
        return r.read()


def crawl_episode_urls(channel_urls: Iterable[str], out_jsonl: str,
                       listing_fn: Optional[ListingFn] = None) -> int:
    """Channel pages -> episode audio URLs jsonl (ttts/spider/spider.py:1-30
    walks player.fm pages with selenium; inject `listing_fn` per site)."""
    if listing_fn is None:
        raise RuntimeError(
            "No listing backend: this image has no selenium/egress. Inject "
            "listing_fn(channel_url) -> [audio_urls] (the reference drives "
            "player.fm/ximalaya with selenium, ttts/spider/)")
    n = 0
    with open(out_jsonl, "a", encoding="utf-8") as f:
        for ch in channel_urls:
            try:
                urls = listing_fn(ch)
            except Exception as e:
                log.warning("listing failed for %s: %s", ch, e)
                continue
            for u in urls:
                f.write(json.dumps({"channel": ch, "url": u}) + "\n")
                n += 1
    return n


def download_audio(url_jsonl: str, out_dir: str,
                   fetch_fn: FetchFn = default_fetch,
                   skip_existing: bool = True) -> List[str]:
    """Download every url in the jsonl (ttts/spider/download.py semantics:
    filename from the url tail, resume by skipping existing files)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    with open(url_jsonl, encoding="utf-8") as f:
        records = [json.loads(l) for l in f if l.strip()]
    for rec in records:
        url = rec["url"]
        name = url.rstrip("/").split("/")[-1].split("?")[0] or "audio"
        path = os.path.join(out_dir, name)
        if skip_existing and os.path.exists(path):
            paths.append(path)
            continue
        try:
            data = fetch_fn(url)
        except Exception as e:
            log.warning("download failed %s: %s", url, e)
            continue
        with open(path, "wb") as out:
            out.write(data)
        paths.append(path)
    return paths
