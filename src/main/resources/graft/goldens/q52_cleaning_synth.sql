WITH pick AS (
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
         SELECT CAST(row_id AS BIGINT) AS row_id, col, value FROM pick