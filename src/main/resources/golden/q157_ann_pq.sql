-- q157_ann_pq: 10 rows, cols=['probe_id', 'hits', 'recall_ok'] types=['NUMBER', 'NUMBER', 'bool']
SELECT probe_id, hits, recall_ok FROM (VALUES
          (0, 5, True),
          (1, 4, True),
          (2, 3, True),
          (3, 4, True),
          (4, 3, True),
          (5, 4, True),
          (6, 3, True),
          (7, 3, True),
          (8, 5, True),
          (9, 4, True)) AS t(probe_id, hits, recall_ok)
        ORDER BY probe_id
