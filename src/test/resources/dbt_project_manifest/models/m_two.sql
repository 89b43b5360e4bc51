SELECT 2 AS x FROM {{ source('ext', 'tbl') }}
