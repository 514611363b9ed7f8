package graft

/** Golden oracles for the two GBT-decision queries (q45 meta-learner,
  * q52 synth-lifecycle): deterministic at fixed SF and parallelism, so
  * the expected corrections are pinned as literal tables the driver's
  * DuckDB oracle selects by scale factor — same trick as q44's Baran
  * draw golden and Q25Golden. Regenerate by running `graft.Verify` at
  * sf0.001 and sf0.01 and dumping the two results.
  */
object GbtGoldens {
  /** Pinned decision table for q45_meta_learner per scale factor (discriminated
    * by the customer row count) — the GBT decisions are seeded and
    * parallelism-independent (verified at local[8] == local[32]).
    */
  val q45: String =
    s"""WITH pick AS (
           SELECT * FROM (VALUES
           (3, 'segment', 'BUILDING'), (37, 'segment', 'BUILDING'), (54, 'segment', 'AUTOMOBILE'), (71, 'segment', 'AUTOMOBILE'),
           (88, 'segment', 'MACHINERY'), (122, 'segment', 'HOUSEHOLD'), (139, 'segment', 'BUILDING'),
           (156, 'segment', 'BUILDING'), (173, 'segment', 'BUILDING'), (207, 'segment', 'BUILDING'), (224, 'segment', 'BUILDING'),
           (241, 'segment', 'MACHINERY'), (258, 'segment', 'AUTOMOBILE'), (292, 'segment', 'AUTOMOBILE'),
           (309, 'segment', 'BUILDING'), (326, 'segment', 'AUTOMOBILE'), (343, 'segment', 'AUTOMOBILE'),
           (377, 'segment', 'BUILDING'), (394, 'segment', 'AUTOMOBILE'), (411, 'segment', 'AUTOMOBILE'),
           (428, 'segment', 'HOUSEHOLD'), (462, 'segment', 'BUILDING'), (479, 'segment', 'BUILDING'),
           (496, 'segment', 'BUILDING'), (513, 'segment', 'BUILDING'), (547, 'segment', 'MACHINERY'),
           (564, 'segment', 'BUILDING'), (581, 'segment', 'BUILDING'), (598, 'segment', 'AUTOMOBILE'),
           (632, 'segment', 'BUILDING'), (649, 'segment', 'HOUSEHOLD'), (666, 'segment', 'AUTOMOBILE'),
           (683, 'segment', 'AUTOMOBILE'), (717, 'segment', 'AUTOMOBILE'), (734, 'segment', 'AUTOMOBILE'),
           (751, 'segment', 'BUILDING'), (768, 'segment', 'BUILDING'), (802, 'segment', 'AUTOMOBILE'),
           (819, 'segment', 'BUILDING'), (836, 'segment', 'BUILDING'), (853, 'segment', 'AUTOMOBILE'),
           (887, 'segment', 'AUTOMOBILE'), (904, 'segment', 'BUILDING'), (921, 'segment', 'MACHINERY'),
           (938, 'segment', 'BUILDING'), (972, 'segment', 'BUILDING'), (989, 'segment', 'MACHINERY'),
           (1006, 'segment', 'HOUSEHOLD'), (1023, 'segment', 'HOUSEHOLD'), (1057, 'segment', 'MACHINERY'),
           (1074, 'segment', 'BUILDING'), (1091, 'segment', 'BUILDING'), (1108, 'segment', 'AUTOMOBILE'),
           (1142, 'segment', 'AUTOMOBILE'), (1159, 'segment', 'AUTOMOBILE'), (1176, 'segment', 'HOUSEHOLD'),
           (1193, 'segment', 'AUTOMOBILE'), (1227, 'segment', 'BUILDING'), (1244, 'segment', 'HOUSEHOLD'),
           (1261, 'segment', 'AUTOMOBILE'), (1278, 'segment', 'HOUSEHOLD'), (1312, 'segment', 'MACHINERY'),
           (1329, 'segment', 'AUTOMOBILE'), (1346, 'segment', 'HOUSEHOLD'), (1363, 'segment', 'AUTOMOBILE'),
           (1397, 'segment', 'HOUSEHOLD'), (1414, 'segment', 'MACHINERY'), (1431, 'segment', 'AUTOMOBILE'),
           (1448, 'segment', 'BUILDING'), (1482, 'segment', 'HOUSEHOLD'), (1499, 'segment', 'HOUSEHOLD')
           ) AS g01(row_id, col, value)
           WHERE (SELECT count(*) FROM customer) = 1500
           UNION ALL
           SELECT * FROM (VALUES
           (3, 'segment', 'MACHINERY'), (37, 'segment', 'HOUSEHOLD'), (54, 'segment', 'HOUSEHOLD'), (71, 'segment', 'MACHINERY'),
           (88, 'segment', 'MACHINERY'), (122, 'segment', 'MACHINERY'), (139, 'segment', 'MACHINERY')
           ) AS g001(row_id, col, value)
           WHERE (SELECT count(*) FROM customer) = 150)
         SELECT CAST(row_id AS BIGINT) AS row_id, col, value FROM pick"""

  /** Pinned decision table for q52_cleaning_synth per scale factor (discriminated
    * by the customer row count) — the GBT decisions are seeded and
    * parallelism-independent (verified at local[8] == local[32]).
    */
  val q52: String =
    s"""WITH pick AS (
           SELECT * FROM (VALUES
           (3, 'segment', 'HOUSEHOLD'), (20, 'segment', 'BUILDING'), (37, 'segment', 'FURNITURE'), (54, 'segment', 'HOUSEHOLD'),
           (71, 'segment', 'MACHINERY'), (88, 'segment', 'HOUSEHOLD'), (105, 'segment', 'MACHINERY'),
           (122, 'segment', 'FURNITURE'), (139, 'segment', 'FURNITURE'), (156, 'segment', 'BUILDING'),
           (173, 'segment', 'FURNITURE'), (190, 'segment', 'BUILDING'), (207, 'segment', 'MACHINERY'),
           (224, 'segment', 'MACHINERY'), (241, 'segment', 'HOUSEHOLD'), (258, 'segment', 'MACHINERY'),
           (275, 'segment', 'HOUSEHOLD'), (292, 'segment', 'FURNITURE'), (309, 'segment', 'FURNITURE'),
           (326, 'segment', 'MACHINERY'), (343, 'segment', 'FURNITURE'), (360, 'segment', 'BUILDING'),
           (377, 'segment', 'FURNITURE'), (394, 'segment', 'MACHINERY'), (411, 'segment', 'MACHINERY'),
           (428, 'segment', 'HOUSEHOLD'), (445, 'segment', 'MACHINERY'), (462, 'segment', 'FURNITURE'),
           (479, 'segment', 'MACHINERY'), (496, 'segment', 'MACHINERY'), (513, 'segment', 'FURNITURE'),
           (530, 'segment', 'BUILDING'), (547, 'segment', 'FURNITURE'), (564, 'segment', 'MACHINERY'),
           (581, 'segment', 'MACHINERY'), (598, 'segment', 'HOUSEHOLD'), (615, 'segment', 'AUTOMOBILE'),
           (632, 'segment', 'FURNITURE'), (649, 'segment', 'MACHINERY'), (666, 'segment', 'HOUSEHOLD'),
           (683, 'segment', 'FURNITURE'), (700, 'segment', 'BUILDING'), (717, 'segment', 'HOUSEHOLD'),
           (734, 'segment', 'MACHINERY'), (751, 'segment', 'HOUSEHOLD'), (768, 'segment', 'HOUSEHOLD'),
           (785, 'segment', 'HOUSEHOLD'), (802, 'segment', 'HOUSEHOLD'), (819, 'segment', 'AUTOMOBILE'),
           (836, 'segment', 'MACHINERY'), (853, 'segment', 'FURNITURE'), (870, 'segment', 'HOUSEHOLD'),
           (887, 'segment', 'MACHINERY'), (904, 'segment', 'HOUSEHOLD'), (921, 'segment', 'FURNITURE'),
           (938, 'segment', 'HOUSEHOLD'), (955, 'segment', 'MACHINERY'), (972, 'segment', 'HOUSEHOLD'),
           (989, 'segment', 'MACHINERY'), (1006, 'segment', 'MACHINERY'), (1023, 'segment', 'FURNITURE'),
           (1040, 'segment', 'BUILDING'), (1057, 'segment', 'HOUSEHOLD'), (1074, 'segment', 'HOUSEHOLD'),
           (1091, 'segment', 'HOUSEHOLD'), (1108, 'segment', 'HOUSEHOLD'), (1125, 'segment', 'HOUSEHOLD'),
           (1142, 'segment', 'FURNITURE'), (1159, 'segment', 'MACHINERY'), (1176, 'segment', 'MACHINERY'),
           (1193, 'segment', 'FURNITURE'), (1210, 'segment', 'BUILDING'), (1227, 'segment', 'BUILDING'),
           (1244, 'segment', 'MACHINERY'), (1261, 'segment', 'FURNITURE'), (1278, 'segment', 'HOUSEHOLD'),
           (1295, 'segment', 'HOUSEHOLD'), (1312, 'segment', 'HOUSEHOLD'), (1329, 'segment', 'MACHINERY'),
           (1346, 'segment', 'MACHINERY'), (1363, 'segment', 'FURNITURE'), (1380, 'segment', 'BUILDING'),
           (1397, 'segment', 'FURNITURE'), (1414, 'segment', 'HOUSEHOLD'), (1431, 'segment', 'MACHINERY'),
           (1448, 'segment', 'HOUSEHOLD'), (1465, 'segment', 'MACHINERY'), (1482, 'segment', 'FURNITURE'),
           (1499, 'segment', 'MACHINERY')
           ) AS g01(row_id, col, value)
           WHERE (SELECT count(*) FROM customer) = 1500
           UNION ALL
           SELECT * FROM (VALUES
           (3, 'segment', 'BUILDING'), (20, 'segment', 'AUTOMOBILE'), (37, 'segment', 'BUILDING'), (54, 'segment', 'AUTOMOBILE'),
           (71, 'segment', 'BUILDING'), (88, 'segment', 'AUTOMOBILE'), (105, 'segment', 'MACHINERY'),
           (122, 'segment', 'MACHINERY'), (139, 'segment', 'BUILDING')
           ) AS g001(row_id, col, value)
           WHERE (SELECT count(*) FROM customer) = 150)
         SELECT CAST(row_id AS BIGINT) AS row_id, col, value FROM pick"""


  /** Pinned decision table for q62_meta_learner_cv per scale factor
    * (discriminated by the customer row count) — CV fold assignment is
    * a seeded row hash (`setFoldCol`), so the cross-validated decisions
    * are parallelism-independent (verified at local[8] == local[32]).
    */
  val q62: String =
    s"""WITH pick AS (
           SELECT * FROM (VALUES
           (3, 'segment', 'BUILDING'), (37, 'segment', 'BUILDING'), (54, 'segment', 'AUTOMOBILE'), (71, 'segment', 'AUTOMOBILE'),
           (88, 'segment', 'MACHINERY'), (122, 'segment', 'HOUSEHOLD'), (139, 'segment', 'BUILDING'), (156, 'segment', 'BUILDING'),
           (173, 'segment', 'BUILDING'), (207, 'segment', 'AUTOMOBILE'), (224, 'segment', 'BUILDING'), (241, 'segment', 'MACHINERY'),
           (258, 'segment', 'AUTOMOBILE'), (292, 'segment', 'BUILDING'), (309, 'segment', 'BUILDING'), (326, 'segment', 'AUTOMOBILE'),
           (343, 'segment', 'AUTOMOBILE'), (377, 'segment', 'BUILDING'), (394, 'segment', 'AUTOMOBILE'), (411, 'segment', 'AUTOMOBILE'),
           (428, 'segment', 'HOUSEHOLD'), (462, 'segment', 'BUILDING'), (479, 'segment', 'BUILDING'), (496, 'segment', 'BUILDING'),
           (513, 'segment', 'BUILDING'), (547, 'segment', 'MACHINERY'), (564, 'segment', 'BUILDING'), (581, 'segment', 'BUILDING'),
           (598, 'segment', 'AUTOMOBILE'), (632, 'segment', 'BUILDING'), (649, 'segment', 'BUILDING'), (666, 'segment', 'AUTOMOBILE'),
           (683, 'segment', 'BUILDING'), (717, 'segment', 'AUTOMOBILE'), (734, 'segment', 'AUTOMOBILE'), (751, 'segment', 'BUILDING'),
           (768, 'segment', 'BUILDING'), (802, 'segment', 'AUTOMOBILE'), (819, 'segment', 'AUTOMOBILE'), (836, 'segment', 'BUILDING'),
           (853, 'segment', 'AUTOMOBILE'), (887, 'segment', 'AUTOMOBILE'), (904, 'segment', 'BUILDING'), (921, 'segment', 'MACHINERY'),
           (938, 'segment', 'BUILDING'), (972, 'segment', 'BUILDING'), (989, 'segment', 'MACHINERY'), (1006, 'segment', 'BUILDING'),
           (1023, 'segment', 'BUILDING'), (1057, 'segment', 'MACHINERY'), (1074, 'segment', 'BUILDING'), (1091, 'segment', 'BUILDING'),
           (1108, 'segment', 'BUILDING'), (1142, 'segment', 'BUILDING'), (1159, 'segment', 'HOUSEHOLD'), (1176, 'segment', 'HOUSEHOLD'),
           (1193, 'segment', 'AUTOMOBILE'), (1227, 'segment', 'AUTOMOBILE'), (1244, 'segment', 'BUILDING'), (1261, 'segment', 'BUILDING'),
           (1278, 'segment', 'HOUSEHOLD'), (1312, 'segment', 'MACHINERY'), (1329, 'segment', 'HOUSEHOLD'), (1346, 'segment', 'BUILDING'),
           (1363, 'segment', 'AUTOMOBILE'), (1397, 'segment', 'HOUSEHOLD'), (1414, 'segment', 'MACHINERY'), (1431, 'segment', 'AUTOMOBILE'),
           (1448, 'segment', 'BUILDING'), (1482, 'segment', 'HOUSEHOLD'), (1499, 'segment', 'BUILDING')
           ) AS g01(row_id, col, value)
           WHERE (SELECT count(*) FROM customer) = 1500
           UNION ALL
           SELECT * FROM (VALUES
           (3, 'segment', 'MACHINERY'), (37, 'segment', 'HOUSEHOLD'), (54, 'segment', 'HOUSEHOLD'), (71, 'segment', 'MACHINERY'),
           (88, 'segment', 'MACHINERY'), (122, 'segment', 'MACHINERY'), (139, 'segment', 'MACHINERY')
           ) AS g001(row_id, col, value)
           WHERE (SELECT count(*) FROM customer) = 150)
         SELECT CAST(row_id AS BIGINT) AS row_id, col, value FROM pick"""

}
