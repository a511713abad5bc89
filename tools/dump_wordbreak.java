// Dump the Unicode Word_Break property (+ Extended_Pictographic flag) as
// ranges, using the icu4j library bundled with Apache Spark.  Build/run:
//   javac -cp "$(python -c 'import pyspark,os;print(os.path.dirname(pyspark.__file__))')/jars/icu4j-*.jar" tools/dump_wordbreak.java -d /tmp/wbdump
//   java -cp "/tmp/wbdump:<icu4j jar>" dump_wordbreak > ranges.txt
// Output lines: "<start-cp-hex> <value-name> <ep-flag>", one per range start.
// The generated table is committed as xapian_spark/text/_wordbreak_data.py
// (public Unicode Character Database data, via icu4j).

import com.ibm.icu.lang.UCharacter;
import com.ibm.icu.lang.UProperty;

public class dump_wordbreak {
    public static void main(String[] args) {
        int prevPacked = -1;
        for (int cp = 0; cp <= 0x10FFFF; cp++) {
            int v = UCharacter.getIntPropertyValue(cp, UProperty.WORD_BREAK);
            boolean ep = UCharacter.hasBinaryProperty(
                cp, UProperty.EXTENDED_PICTOGRAPHIC);
            int packed = v * 2 + (ep ? 1 : 0);
            if (packed != prevPacked) {
                String name = UCharacter.getPropertyValueName(
                    UProperty.WORD_BREAK, v, UProperty.NameChoice.LONG);
                System.out.println(
                    Integer.toHexString(cp) + " " + name + " " + (ep ? 1 : 0));
                prevPacked = packed;
            }
        }
    }
}
