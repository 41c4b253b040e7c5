"""Fixture goldens for coauthor edges (G1/G2) and personal net (G3).

Hand-derived from the AddTestData topology (FIXTURES.md §2):
papers→authors — 0:{1,2,3} 1:{1,2} 2:{2,3,4} 3:{2,5} 4:{1,2,3}
5:{4,5} 6:{6,7} 7:{6,7} 8:{5} 9:{7}.
"""

from __future__ import annotations

from iconic_data_science_spark import fixtures
from iconic_data_science_spark.operators.coauthor import coauthor_edges
from iconic_data_science_spark.operators.personal_net import personal_net


def _edges(spark):
    return coauthor_edges(fixtures.paa_df(spark), fixtures.paper_years_df(spark))


def test_coauthor_edge_weights_and_years(spark):
    rows = {(r.ego, r.alter_id): (r.papers_together, r.first_year) for r in _edges(spark).collect()}
    # authors 1,2 share papers 0,1,4 → weight 3, first year min(1993,1992,2004)=1992
    assert rows[(1, 2)] == (3, 1992)
    assert rows[(2, 1)] == (3, 1992)  # undirected → both orientations
    # authors 2,3 share papers 0,2,4 → weight 3, first min(1993,1991,2004)=1991
    assert rows[(2, 3)] == (3, 1991)
    # authors 4,5 share paper 5 only
    assert rows[(4, 5)] == (1, 2005)
    # authors 6,7 share papers 6,7
    assert rows[(6, 7)] == (2, 2006)
    # no self pairs, no non-collaborators
    assert (1, 1) not in rows and (1, 5) not in rows


def test_personal_net_triadic_closure(spark):
    edges = _edges(spark).select("ego", "alter_id", "first_year")
    result = {(r.ego, r.alter1, r.alter2, r.year) for r in personal_net(edges).collect()}
    # ego 1: alters {2,3}; 2-3 collaborated (first 1991).
    # year = max(first(1,2)=1992, first(1,3)=1993, first(2,3)=1991) = 1993
    assert (1, 2, 3, 1993) in result
    # ego 2: alters {1,3,4,5}; closed pairs: (1,3) via papers 0/4, (4,5) via paper 5
    assert (2, 1, 3, 1993) in result
    assert (2, 4, 5, 2005) in result
    # ego 3: alters {1,2,4}; pair (1,2) closed → max(1993,1991... ) compute:
    # first(3,1)=1993, first(3,2)=1990? papers of 3&2: 0(1993),2(1991),4(2004) → 1991;
    # pair year = max(first(3,1)=1993, first(3,2)=1991, first(1,2)=1992) = 1993
    assert (3, 1, 2, 1993) in result
    # ego 6/7 have a single alter each → no pairs
    assert not any(t[0] in (6, 7) for t in result)
    # no pair where the alters never collaborated: ego 2 alters 1 and 4 never met
    assert not any(t[0] == 2 and t[1] == 1 and t[2] == 4 for t in result)
    # triangular order holds
    assert all(t[1] < t[2] for t in result)


def test_salted_equals_plain_any_buckets(spark):
    """personal_net_salted must be row-identical to personal_net for
    every bucket count — salt values spread the pair build across
    buckets² reducer keys but never reach the output."""
    from iconic_data_science_spark.operators.personal_net import personal_net_salted

    edges = _edges(spark).select("ego", "alter_id", "first_year")
    plain = sorted(map(tuple, personal_net(edges).collect()))
    assert plain
    for b in (1, 3, 8):
        salted = sorted(map(tuple, personal_net_salted(edges, buckets=b).collect()))
        assert salted == plain, f"buckets={b}"
