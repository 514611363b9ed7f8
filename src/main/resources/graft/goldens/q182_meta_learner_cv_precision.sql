WITH pick AS (
           SELECT * FROM (VALUES
           (3, 'segment', 'BUILDING'), (37, 'segment', 'BUILDING'), (54, 'segment', 'AUTOMOBILE'), (71, 'segment', 'AUTOMOBILE'),
           (88, 'segment', 'MACHINERY'), (122, 'segment', 'HOUSEHOLD'), (139, 'segment', 'BUILDING'), (156, 'segment', 'BUILDING'),
           (173, 'segment', 'BUILDING'), (207, 'segment', 'BUILDING'), (224, 'segment', 'BUILDING'), (241, 'segment', 'MACHINERY'),
           (258, 'segment', 'AUTOMOBILE'), (292, 'segment', 'BUILDING'), (309, 'segment', 'BUILDING'), (326, 'segment', 'AUTOMOBILE'),
           (343, 'segment', 'AUTOMOBILE'), (377, 'segment', 'BUILDING'), (394, 'segment', 'AUTOMOBILE'), (411, 'segment', 'AUTOMOBILE'),
           (428, 'segment', 'HOUSEHOLD'), (462, 'segment', 'BUILDING'), (479, 'segment', 'BUILDING'), (496, 'segment', 'BUILDING'),
           (513, 'segment', 'BUILDING'), (547, 'segment', 'MACHINERY'), (564, 'segment', 'BUILDING'), (581, 'segment', 'BUILDING'),
           (598, 'segment', 'AUTOMOBILE'), (632, 'segment', 'BUILDING'), (649, 'segment', 'HOUSEHOLD'), (666, 'segment', 'AUTOMOBILE'),
           (683, 'segment', 'BUILDING'), (717, 'segment', 'AUTOMOBILE'), (734, 'segment', 'AUTOMOBILE'), (751, 'segment', 'BUILDING'),
           (768, 'segment', 'BUILDING'), (802, 'segment', 'AUTOMOBILE'), (819, 'segment', 'BUILDING'), (836, 'segment', 'BUILDING'),
           (853, 'segment', 'AUTOMOBILE'), (887, 'segment', 'AUTOMOBILE'), (904, 'segment', 'HOUSEHOLD'), (921, 'segment', 'MACHINERY'),
           (938, 'segment', 'HOUSEHOLD'), (972, 'segment', 'HOUSEHOLD'), (989, 'segment', 'MACHINERY'), (1006, 'segment', 'HOUSEHOLD'),
           (1023, 'segment', 'HOUSEHOLD'), (1057, 'segment', 'MACHINERY'), (1074, 'segment', 'HOUSEHOLD'), (1091, 'segment', 'HOUSEHOLD'),
           (1108, 'segment', 'BUILDING'), (1142, 'segment', 'BUILDING'), (1159, 'segment', 'AUTOMOBILE'), (1176, 'segment', 'HOUSEHOLD'),
           (1193, 'segment', 'AUTOMOBILE'), (1227, 'segment', 'BUILDING'), (1244, 'segment', 'HOUSEHOLD'), (1261, 'segment', 'BUILDING'),
           (1278, 'segment', 'HOUSEHOLD'), (1312, 'segment', 'MACHINERY'), (1329, 'segment', 'AUTOMOBILE'), (1346, 'segment', 'HOUSEHOLD'),
           (1363, 'segment', 'AUTOMOBILE'), (1397, 'segment', 'HOUSEHOLD'), (1414, 'segment', 'MACHINERY'), (1431, 'segment', 'AUTOMOBILE'),
           (1448, 'segment', 'BUILDING'), (1482, 'segment', 'HOUSEHOLD'), (1499, 'segment', 'HOUSEHOLD')
           ) AS g01(row_id, col, value)
           WHERE (SELECT count(*) FROM customer) = 1500
           UNION ALL
           SELECT * FROM (VALUES
           (3, 'segment', 'MACHINERY'), (37, 'segment', 'HOUSEHOLD'), (54, 'segment', 'HOUSEHOLD'), (71, 'segment', 'MACHINERY'),
           (88, 'segment', 'MACHINERY'), (122, 'segment', 'MACHINERY'), (139, 'segment', 'MACHINERY')
           ) AS g001(row_id, col, value)
           WHERE (SELECT count(*) FROM customer) = 150)
         SELECT CAST(row_id AS BIGINT) AS row_id, col, value FROM pick