"""Generate the reference-shaped bronze JSONL fixtures (FIXTURES.md §A).

Deterministic (seed 42). Writes tests/fixtures/bronze/{stocks,
company_info,news}.jsonl — the raw record shapes of the reference's
ingestion layer (yahoo_stocks.py:30-39,53-62; finnhub_news.py:101-114)
as JSON Lines (our S1 decision: JSONL splits, multiLine arrays don't).

Planted edge cases the ETL must handle:
- one symbol (JPM) has no company_info row (left-join null survival),
- one symbol (WMT) has no news (null news_count/latest_news_date),
- news contains pre-2020/epoch-zero artifacts (P4 range filter) and
  duplicate ids with identical (id, symbol, pub_date) (dedup S11).

Run once; outputs are committed. Timestamps use 'yyyy-MM-dd HH:mm:ss'
so Spark and DuckDB parse them identically.
"""

from __future__ import annotations

import json
import random
from datetime import date, datetime, timedelta
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "bronze"

SYMBOLS = ["AAPL", "GOOGL", "MSFT", "AMZN", "META", "TSLA", "NVDA", "JPM", "V", "WMT"]
SECTORS = {
    "AAPL": ("Apple Inc.", "Technology", "Consumer Electronics"),
    "GOOGL": ("Alphabet Inc.", "Technology", "Internet Content"),
    "MSFT": ("Microsoft Corporation", "Technology", "Software"),
    "AMZN": ("Amazon.com Inc.", "Consumer Cyclical", "Internet Retail"),
    "META": ("Meta Platforms Inc.", "Technology", "Internet Content"),
    "TSLA": ("Tesla Inc.", "Consumer Cyclical", "Auto Manufacturers"),
    "NVDA": ("NVIDIA Corporation", "Technology", "Semiconductors"),
    "JPM": ("JPMorgan Chase & Co.", "Financial Services", "Banks"),
    "V": ("Visa Inc.", "Financial Services", "Credit Services"),
    "WMT": ("Walmart Inc.", "Consumer Defensive", "Discount Stores"),
}
PROVIDERS = ["Reuters", "Bloomberg", "WSJ", "CNBC", "MarketWatch", "Barrons"]
TITLE_WORDS = (
    "shares surge on strong quarterly profit growth beat analyst "
    "estimates stock falls after weak guidance decline outlook revenue "
    "record high market rally upgrade downgrade risk lawsuit"
).split()


def business_days(start: date, n: int) -> list[date]:
    out, d = [], start
    while len(out) < n:
        if d.isoweekday() <= 5:
            out.append(d)
        d += timedelta(days=1)
    return out


def main() -> None:
    rng = random.Random(42)
    OUT.mkdir(parents=True, exist_ok=True)
    days = business_days(date(2024, 1, 2), 60)
    fetched = "2024-04-01 06:00:00"

    with (OUT / "stocks.jsonl").open("w") as f:
        for sym in SYMBOLS:
            px = rng.uniform(50, 600)
            for d in days:
                o = px
                c = o * rng.uniform(0.95, 1.05)
                hi = max(o, c) * rng.uniform(1.0, 1.03)
                lo = min(o, c) * rng.uniform(0.97, 1.0)
                f.write(json.dumps({
                    "symbol": sym,
                    "date": d.isoformat(),
                    "open": round(o, 2),
                    "high": round(hi, 2),
                    "low": round(lo, 2),
                    "close": round(c, 2),
                    "volume": rng.randrange(1_000_000, 200_000_000),
                    "fetched_at": fetched,
                }) + "\n")
                px = c

    with (OUT / "company_info.jsonl").open("w") as f:
        for sym in SYMBOLS:
            if sym == "JPM":  # planted: missing dim row
                continue
            name, sector, industry = SECTORS[sym]
            f.write(json.dumps({
                "symbol": sym,
                "name": name,
                "sector": sector,
                "industry": industry,
                "country": "United States",
                "market_cap": rng.randrange(400_000_000_000, 4_000_000_000_000),
                "currency": "USD",
                "fetched_at": fetched,
            }) + "\n")

    def news_row(i: int, sym: str, pub: str) -> dict:
        score = round(rng.uniform(-1, 1), 4)
        label = ("positive" if score >= 0.05
                 else "negative" if score <= -0.05 else "neutral")
        return {
            "id": str(100000 + i),
            "symbol": sym,
            "title": " ".join(rng.choice(TITLE_WORDS) for _ in range(8)),
            "summary": " ".join(rng.choice(TITLE_WORDS) for _ in range(20)),
            "pub_date": pub,
            "provider": rng.choice(PROVIDERS),
            "category": rng.choice(["company", "business", "top news"]),
            "url": f"https://news.example.com/{sym.lower()}/{100000 + i}",
            "image": f"https://img.example.com/{100000 + i}.jpg",
            "sentiment_score": score,
            "sentiment_label": label,
            "fetched_at": fetched,
        }

    with (OUT / "news.jsonl").open("w") as f:
        i = 0
        rows = []
        for sym in SYMBOLS:
            if sym == "WMT":  # planted: symbol with zero news
                continue
            for _ in range(rng.randrange(12, 25)):
                d = rng.choice(days)
                pub = f"{d.isoformat()} {rng.randrange(0, 24):02d}:{rng.randrange(0, 60):02d}:00"
                rows.append(news_row(i, sym, pub))
                i += 1
        # planted: epoch-zero / pre-2020 artifacts (silver filter drops)
        rows.append(news_row(i, "AAPL", "1970-01-01 00:00:00")); i += 1
        rows.append(news_row(i, "MSFT", "2019-06-01 12:00:00")); i += 1
        # planted: duplicate ids — same (id, symbol, pub_date), differing
        # url, as Finnhub re-serves articles across month windows
        for dup in (rows[0], rows[5], rows[9]):
            clone = dict(dup)
            clone["url"] = clone["url"] + "?repost=1"
            rows.append(clone)
        for r in rows:
            f.write(json.dumps(r) + "\n")

    for p in sorted(OUT.glob("*.jsonl")):
        print(p.name, sum(1 for _ in p.open()))


if __name__ == "__main__":
    main()
