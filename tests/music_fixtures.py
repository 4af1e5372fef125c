"""Seeded music-domain fixture generator (FIXTURES.md §1-§6, seed=42 — the
reference's generators are unseeded; ours must be deterministic).

Tables are written as parquet (micros timestamps, via DuckDB) so Spark and
the DuckDB oracle read identical bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GENRES = ["Pop", "Rock", "Hip-Hop", "Jazz", "Electronic", "Classical", "Country"]

N_SONGS = 300
N_USERS = 50
N_ARTISTS = 50
EVENT_DAYS = pd.date_range("2024-01-25", "2024-02-11", freq="D")  # month boundary
EVENTS_PER_DAY = 150


def build_fixtures(out_dir: str) -> dict[str, str]:
    """Generate all tables, write parquet to ``out_dir``, return name->path."""
    import duckdb

    rng = np.random.default_rng(42)

    songs = pd.DataFrame(
        {
            "track_id": np.arange(10001, 10001 + N_SONGS, dtype="int64"),
            "title": [f"Song Title {i}" for i in range(N_SONGS)],
            "artist_id": rng.integers(1, N_ARTISTS + 1, N_SONGS),
            "genre": rng.choice(GENRES, N_SONGS),
            "duration_ms": rng.integers(120000, 300001, N_SONGS).astype("int32"),
            "release_date": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 20, N_SONGS), unit="D"),
            "base_popularity": rng.uniform(0.1, 1.0, N_SONGS).astype("float32"),
        }
    )
    songs["artist_name"] = "Artist " + songs["artist_id"].astype(str)

    users = pd.DataFrame(
        {
            "user_id": np.arange(1, N_USERS + 1, dtype="int64"),
            "user_name": [f"User_{i}" for i in range(1, N_USERS + 1)],
            "preferred_genres": [
                ",".join(rng.choice(GENRES, rng.integers(1, 4), replace=False))
                for _ in range(N_USERS)
            ],
            "join_date": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10, N_USERS), unit="D"),
        }
    )

    playlists, bridge = [], []
    pid = 0
    for u in users.itertuples():
        for k in range(rng.integers(0, 6)):
            pid += 1
            playlists.append(
                (pid, f"{u.user_name}'s Mix #{k + 1}", u.user_id, u.join_date)
            )
            tracks = rng.choice(
                songs["track_id"], size=rng.integers(10, 21), replace=False
            )
            bridge.extend((pid, int(t)) for t in tracks)
    dim_playlists = pd.DataFrame(
        playlists,
        columns=["playlist_id", "playlist_name", "owner_user_id", "created_date"],
    )
    bridge_df = pd.DataFrame(bridge, columns=["playlist_id", "track_id"])

    edges = set()
    for u in range(1, N_USERS + 1):
        for v in rng.choice(
            [x for x in range(1, N_USERS + 1) if x != u],
            size=rng.integers(3, 9),
            replace=False,
        ):
            edges.add((u, int(v)))
            edges.add((int(v), u))  # stored symmetric (FIXTURES §5)
    follows = pd.DataFrame(sorted(edges), columns=["user_id_a", "user_id_b"])

    pop = songs["base_popularity"].to_numpy().astype("float64")
    pop = pop / pop.sum()
    n_total = EVENTS_PER_DAY * len(EVENT_DAYS)
    days = np.repeat(EVENT_DAYS.to_numpy(), EVENTS_PER_DAY)
    events = pd.DataFrame(
        {
            "event_id": [f"evt_{n}" for n in range(n_total)],
            "user_id": rng.integers(1, N_USERS + 1, n_total),
            "track_id": rng.choice(songs["track_id"], size=n_total, p=pop),
            "event_type": rng.choice(
                ["complete_listen", "like", "skip"], size=n_total, p=[0.7, 0.15, 0.15]
            ),
            "timestamp": pd.Series(days)
            + pd.to_timedelta(rng.integers(0, 86400, n_total), unit="s"),
        }
    )

    frames = {
        "dim_songs": songs,
        "dim_users": users,
        "dim_playlists": dim_playlists,
        "bridge_playlist_tracks": bridge_df,
        "graph_user_follows": follows,
        "fact_listening_events": events,
    }
    con = duckdb.connect()
    paths = {}
    for name, pdf in frames.items():
        p = f"{out_dir}/{name}.parquet"
        con.register("t", pdf)
        con.execute(f"COPY (SELECT * FROM t) TO '{p}' (FORMAT PARQUET)")
        con.unregister("t")
        paths[name] = p
    con.close()
    return paths
