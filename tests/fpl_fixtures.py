"""Deterministic synthetic FPL JSON fixtures (FIXTURES.md shapes).

4 teams, 6 gameweeks, 12 fixtures (6 finished, 1 in-play, 4 future, 1
postponed with null gameweek + malformed kickoff), 3 players covering the
dup-drop / empty-list / new-player paths. Golden league table is derivable
by hand; see test_etl.py.
"""

from __future__ import annotations

import json
import os

TEAMS = [
    {"code": 100 + i, "id": i, "name": n, "short_name": s, "strength": 3,
     "strength_overall_home": 1200, "strength_overall_away": 1150,
     "strength_attack_home": 1100, "strength_attack_away": 1080,
     "strength_defence_home": 1250, "strength_defence_away": 1220,
     # dropped columns (run_transform.py:187-188)
     "draw": 0, "form": None, "loss": 0, "played": 0, "points": 0,
     "position": i, "team_division": None, "unavailable": False, "win": 0}
    for i, (n, s) in enumerate(
        [("Arsenal", "ARS"), ("Burnley", "BUR"), ("Chelsea", "CHE"), ("Derby", "DER")], start=1
    )
]

POSITIONS = [
    {"id": i, "singular_name": n, "singular_name_short": s,
     "squad_select": sel, "squad_min_play": mn, "squad_max_play": mx,
     "plural_name": n + "s", "plural_name_short": s + "S",
     "ui_shirt_specific": False, "sub_positions_locked": []}
    for i, (n, s, sel, mn, mx) in enumerate(
        [("Goalkeeper", "GKP", 2, 1, 1), ("Defender", "DEF", 5, 3, 5),
         ("Midfielder", "MID", 5, 2, 5), ("Forward", "FWD", 3, 1, 3)], start=1
    )
]

# (id, event, team_h, team_a, h_score, a_score, started, finished)
_FX = [
    (1, 1, 1, 2, 2, 0, True, True),
    (2, 1, 3, 4, 1, 1, True, True),
    (3, 2, 2, 3, 0, 1, True, True),
    (4, 2, 4, 1, 0, 3, True, True),
    (5, 3, 1, 3, 1, 2, True, True),
    (6, 3, 2, 4, 2, 2, True, True),
    (7, 4, 1, 4, None, None, True, False),     # in-play: started, not finished
    (8, 4, 2, 3, None, None, False, False),
    (9, 5, 3, 1, None, None, False, False),
    (10, 5, 4, 2, None, None, False, False),
    (11, 6, 1, 2, None, None, False, False),
    (12, None, 3, 2, None, None, False, False),  # postponed: null gameweek
]


def _kickoff(fid: int, event: int | None) -> str | None:
    if fid == 12:
        return "not-a-timestamp"  # malformed → to_datetime coerce null
    if event is None:
        return None
    return f"2020-0{event}-0{(fid % 7) + 1}T1{fid % 10}:00:00Z"


FIXTURES = [
    {
        "code": 1000 + fid, "id": fid, "event": ev, "kickoff_time": _kickoff(fid, ev),
        "provisional_start_time": False, "started": st, "finished": fin,
        "finished_provisional": fin, "minutes": 90 if fin else 0,
        "team_h": h, "team_a": a, "team_h_score": hs, "team_a_score": as_,
        "team_h_difficulty": 2, "team_a_difficulty": 3,
        "stats": [{"identifier": "goals_scored", "a": [], "h": []}],
    }
    for fid, ev, h, a, hs, as_, st, fin in _FX
]

EVENTS = [
    {"id": i, "name": f"Gameweek {i}", "deadline_time": f"2020-0{i}-01T11:00:00Z",
     "deadline_time_epoch": 1580000000 + i * 604800, "deadline_time_game_offset": 0,
     "chip_plays": [], "top_element_info": {"id": 10, "points": 9},
     "finished": i <= 3, "data_checked": i <= 3,
     "is_previous": i == 3, "is_current": i == 4, "is_next": i == 5,
     "average_entry_score": 50 + i if i <= 3 else None,
     "highest_score": 90 + i if i <= 3 else None,
     "highest_scoring_entry": 7000000 + i if i <= 3 else None,
     "most_selected": 10, "most_transferred_in": 11, "top_element": 10,
     "most_captained": 10, "most_vice_captained": 12,
     "transfers_made": 1000 * i}
    for i in range(1, 7)
]


def _element(pid: int, team: int, etype: int, news: str) -> dict:
    return {
        "code": 200 + pid, "id": pid, "first_name": f"First{pid}",
        "second_name": f"Sëcond-{pid}", "element_type": etype, "team": team,
        "team_code": 100 + team, "squad_number": pid, "web_name": f"W{pid}",
        "now_cost": 50 + pid, "selected_by_percent": "12.5", "form": "3.2",
        "points_per_game": "4.1", "value_form": "0.6", "value_season": "7.7",
        "ep_next": "3.5", "ep_this": "3.0",
        "chance_of_playing_next_round": 75 if pid == 11 else None,
        "chance_of_playing_this_round": 100 if pid == 11 else None,
        "cost_change_event": 0, "cost_change_event_fall": 0,
        "cost_change_start": 1, "cost_change_start_fall": -1,
        "news": news, "news_added": "2020-03-01T10:00:00Z" if news else None,
        "in_dreamteam": pid == 10, "special": False, "dreamteam_count": 1,
        "event_points": 5, "total_points": 30 + pid, "transfers_in": 100,
        "transfers_out": 50, "transfers_in_event": 10, "transfers_out_event": 5,
        "minutes": 900, "goals_scored": 3, "assists": 2, "clean_sheets": 4,
        "goals_conceded": 8, "own_goals": 0, "penalties_saved": 0,
        "penalties_missed": 1, "yellow_cards": 2, "red_cards": 0, "saves": 0,
        "bonus": 6, "bps": 300, "photo": f"{200+pid}.jpg", "status": "a",
        "influence": "500.2", "creativity": "300.4", "threat": "250.0",
        "ict_index": "105.1",
    }


ELEMENTS = [
    _element(10, 1, 3, ""),
    _element(11, 3, 4, "Knee injury - 75% chance of playing"),
    _element(12, 2, 1, ""),
]


def _hist_row(pid: int, fid: int, gw: int, was_home: bool, points: int, minutes: int) -> dict:
    return {
        "element": pid, "fixture": fid, "opponent_team": 2, "total_points": points,
        "was_home": was_home, "kickoff_time": _kickoff(fid, gw),
        "team_h_score": next(hs for f, e, h, a, hs, asc, s, fin in _FX if f == fid),
        "team_a_score": next(asc for f, e, h, a, hs, asc, s, fin in _FX if f == fid),
        "round": gw, "minutes": minutes, "goals_scored": 1, "assists": 0,
        "clean_sheets": 0, "goals_conceded": 1, "own_goals": 0,
        "penalties_saved": 0, "penalties_missed": 0, "yellow_cards": 0,
        "red_cards": 0, "saves": 0, "bonus": 1, "bps": 20,
        "influence": "30.2", "creativity": "10.0", "threat": "40.0",
        "ict_index": "8.0", "value": 55, "transfers_balance": 10,
        "selected": 100000, "transfers_in": 20, "transfers_out": 10,
    }


def _future_row(pid: int, fid: int) -> dict:
    fx = next(f for f in FIXTURES if f["id"] == fid)
    return {
        "id": fid, "code": fx["code"], "team_h": fx["team_h"], "team_a": fx["team_a"],
        "team_h_score": None, "team_a_score": None, "event": fx["event"],
        "finished": False, "minutes": 0, "provisional_start_time": False,
        "kickoff_time": fx["kickoff_time"], "event_name": f"Gameweek {fx['event']}",
        "is_home": fx["team_h"] in (1, 3), "difficulty": 3,
    }


PLAYERS = {
    # player 10 (team 1): history gw1-3 + fixture 7 ALSO in future (dup-drop
    # path run_transform.py:366-370: the null-total_points copy must go)
    "10": {
        "history": [
            _hist_row(10, 1, 1, True, 8, 90),
            _hist_row(10, 4, 2, False, 6, 85),
            _hist_row(10, 5, 3, True, 2, 90),
            _hist_row(10, 7, 4, True, 1, 45),  # current gameweek, also in fixtures
        ],
        "fixtures": [_future_row(10, 7), _future_row(10, 9), _future_row(10, 11)],
        "history_past": [],
    },
    # player 11 (team 3): two previous seasons, no remaining fixtures
    "11": {
        "history": [
            _hist_row(11, 2, 1, True, 3, 90),
            _hist_row(11, 3, 2, False, 7, 90),
            _hist_row(11, 5, 3, False, 12, 90),
        ],
        "fixtures": [],
        "history_past": [
            {"season_name": "2018/19", "element_code": 211, "start_cost": 50,
             "end_cost": 52, "total_points": 120, "minutes": 2700,
             "goals_scored": 10, "assists": 5, "clean_sheets": 8,
             "goals_conceded": 30, "own_goals": 0, "penalties_saved": 0,
             "penalties_missed": 0, "yellow_cards": 3, "red_cards": 0,
             "saves": 0, "bonus": 12, "bps": 600, "influence": 700.5,
             "creativity": 400.2, "threat": 500.0, "ict_index": 160.1},
            {"season_name": "2019/20", "element_code": 211, "start_cost": 52,
             "end_cost": 55, "total_points": 140, "minutes": 3000,
             "goals_scored": 12, "assists": 7, "clean_sheets": 10,
             "goals_conceded": 25, "own_goals": 0, "penalties_saved": 0,
             "penalties_missed": 1, "yellow_cards": 2, "red_cards": 0,
             "saves": 0, "bonus": 15, "bps": 700, "influence": 800.0,
             "creativity": 450.0, "threat": 550.5, "ict_index": 180.0},
        ],
    },
    # player 12 (team 2): new player — future only, including the postponed
    # fixture 12 (null gameweek → row dropped, run_transform.py:327-335)
    "12": {
        "history": [],
        "fixtures": [_future_row(12, 8), _future_row(12, 10), _future_row(12, 12)],
        "history_past": [],
    },
}

MAIN = {"events": EVENTS, "teams": TEAMS, "element_types": POSITIONS, "elements": ELEMENTS}


def write_fixture_files(outdir: str) -> dict[str, str]:
    paths = {}
    for name, payload in [("fixtures", FIXTURES), ("main", MAIN), ("players", PLAYERS)]:
        p = os.path.join(outdir, f"{name}.json")
        with open(p, "w") as f:
            json.dump(payload, f)
        paths[name] = p
    return paths
